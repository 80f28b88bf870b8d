package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Sketches, TextAnalysis}

/** Property tests for the deterministic sketch family: the guarantees
  * each sketch is DEFINED by (HLL error envelope, Bloom no-false-
  * negatives, CMS never-underestimates), checked on the real testdata.
  */
class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val toks = Tables.documents(spark, sf)
    .select(col("source"),
      explode(TextAnalysis.whitespaceTokens(lower(col("text"))))
        .as("tok"))

  private lazy val orderkeys = Tables.lineitem(spark, sf)
    .select(col("l_returnflag").as("flag"),
      col("l_orderkey").cast("string").as("k"))

  test("HLL estimate lands inside the error envelope (raw regime)") {
    val est = Sketches.hllDistinct(orderkeys, "k", Seq("flag"), 8)
      .join(orderkeys.groupBy("flag")
        .agg(count_distinct(col("k")).as("n_exact")), Seq("flag"))
      .select("flag", "n_exact", "hll_estimate")
      .collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val exact = r.getLong(1).toDouble
      val hll = r.getDouble(2)
      // σ ≈ 1.04/√m = 6.5% at m=256; assert a generous 4σ
      assert(math.abs(hll - exact) / exact < 0.26,
        s"${r.getString(0)}: hll=$hll exact=$exact")
    }
  }

  test("HLL shard sketches max-merge to the one-pass sketch") {
    // sketch two shards SEPARATELY, merge the register tables by max —
    // must equal the one-pass sketch exactly (what makes HLL shardable:
    // 1000 executors each sketch their split, the driver merges 3×256
    // rows instead of re-reading 100 TB)
    val a = orderkeys.filter(col("k").cast("long") % 2 === 0)
    val b = orderkeys.filter(col("k").cast("long") % 2 === 1)
    val merged = Sketches.hllFinalize(
      Sketches.hllMerge(Seq(
        Sketches.hllRegisters(a, "k", Seq("flag"), 8),
        Sketches.hllRegisters(b, "k", Seq("flag"), 8)), Seq("flag")),
      Seq("flag"), 8)
    val whole = Sketches.hllDistinct(orderkeys, "k", Seq("flag"), 8)
    val cmp = whole.select(col("flag"), col("t_scaled").as("w"))
      .join(merged.select(col("flag"), col("t_scaled").as("m")),
        Seq("flag")).collect()
    assert(cmp.nonEmpty && cmp.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("Bloom filter has NO false negatives and bounded size") {
    val n = Tables.documents(spark, sf)
      .select(col("doc_id"),
        lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("fp"))
    val old = n.filter(col("doc_id") % 2 === 0).select("fp")
    val bloom = Sketches.bloomBuild(old, "fp", 131072, 3)
    assert(bloom.count() <= 131072 / 64) // word-packed, broadcast-sized
    // every member probes positive — the defining guarantee
    val selfProbe = Sketches.bloomProbe(old.distinct(), "fp", bloom,
      131072, 3)
    assert(selfProbe.filter(!col("bloom_positive")).count() == 0)
  }

  test("token chunking: boundary arithmetic covers the tail exactly once") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 64).map(i => s"t$i").mkString(" ")), // exactly one window
      (2L, (1 to 65).map(i => s"t$i").mkString(" ")), // one token over
      (3L, (1 to 160).map(i => s"t$i").mkString(" ")), // 64+48+48 = 3 chunks
      (4L, "solo"), // tiny doc
      (5L, "   ") // whitespace-only → zero tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenWindowChunks(docs, "doc_id", "text", 64, 48)
      .select("doc_id", "chunk_idx", "start_tok", "n_tok")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, 64L),
      (2L, 0L, 0L, 64L), (2L, 1L, 48L, 17L),
      (3L, 0L, 0L, 64L), (3L, 1L, 48L, 64L), (3L, 2L, 96L, 64L),
      (4L, 0L, 0L, 1L)))
    // every token of doc 3 appears in some chunk, tail not duplicated:
    // last chunk starts at 96 and carries tokens 97..160
    val last = TextAnalysis.tokenWindowChunks(docs, "doc_id", "text", 64, 48)
      .filter(col("doc_id") === 3 && col("chunk_idx") === 2)
      .select("chunk_text").as[String].head()
    assert(last.startsWith("t97 ") && last.endsWith(" t160"))
  }

  test("CMS never underestimates and row-min tightens the bound") {
    val t = toks.select("tok")
    val cms = Sketches.cmsBuild(t, "tok", 1024, 3)
    assert(cms.count() <= 3 * 1024)
    val truth = t.groupBy("tok").agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("tok")).limit(50)
    val est = Sketches.cmsEstimate(truth, "tok", cms, 1024, 3)
      .join(truth, Seq("tok")).collect()
    assert(est.nonEmpty)
    est.foreach(r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("true_count"),
        s"${r.getAs[String]("tok")} underestimated"))
  }
}

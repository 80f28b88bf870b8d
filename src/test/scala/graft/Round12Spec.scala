package graft

import graft.pipeline.{Dedup, DedupArtifacts}
import org.apache.spark.sql.functions._

/** Round-12 additions: the shared persisted dedup artifact and its
  * pre-bucketed connected-components consumer.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("connectedComponentsPreBucketed ≡ connectedComponents on the " +
    "documents corpus") {
    val docs = Tables.documents(spark, sf)
    val viaEdges = Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaArtifact = Dedup.nearDupClustersShared(
        docs, "doc_id", "text", 3, 0.5, corpusKey = sf)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaArtifact.toSeq == viaEdges.toSeq)
    assert(viaArtifact.nonEmpty)
  }

  test("GraphArtifacts.coOccurrenceEdges ≡ Behavior.coOccurrenceEdges " +
    "and is materialized once") {
    import graft.pipeline.{Behavior, GraphArtifacts}
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val direct = Behavior.coOccurrenceEdges(li, "l_orderkey",
        "l_partkey", minCount = 2L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = GraphArtifacts.coOccurrenceEdges(li, "l_orderkey",
      "l_partkey", minCount = 2L, corpusKey = sf)
    val b = GraphArtifacts.coOccurrenceEdges(li, "l_orderkey",
      "l_partkey", minCount = 2L, corpusKey = sf)
    // one materialization per (corpus fingerprint, params): both calls
    // resolve ONE registered (and cached) warehouse table (r14 tier;
    // cross-session reuse is pinned in ArtifactWarehouseSpec)
    assert(spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_wh_graph_cooc_")) >= 1)
    assert(b.collect().length == a.collect().length)
    val shared = a.orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(shared.toSeq == direct.toSeq)
  }

  test("labelPropagationSym over the artifact ≡ labelPropagation over " +
    "raw edges") {
    import graft.pipeline.Behavior
    val docs = Tables.documents(spark, sf)
    val seeds = docs.select(col("doc_id").as("id"),
      col("source").as("label"))
    val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val viaEdges = Behavior.labelPropagation(seeds, edges, rounds = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    val sym = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5, sf)
    val viaSym = Behavior.labelPropagationSym(seeds, sym, rounds = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(viaSym.toSeq == viaEdges.toSeq)
  }

  // ---- statistics-family tie/degenerate hardening (verdict item #8)

  test("mannWhitneyU: all-tied input (zero variance) yields null z, " +
    "not an error") {
    import graft.pipeline.Profiler
    val tied = Seq.tabulate(12)(i => (i % 2, 7L)).toDF("coh", "v")
    val r = Profiler.mannWhitneyU(tied, "coh", "v").collect().head
    assert(r.getAs[Long]("n_a") == 6 && r.getAs[Long]("n_b") == 6)
    assert(r.isNullAt(r.fieldIndex("z")), r.toString)
  }

  test("mannWhitneyU: single-cohort input yields null z") {
    import graft.pipeline.Profiler
    val one = Seq.tabulate(8)(i => (0, i.toLong)).toDF("coh", "v")
    val r = Profiler.mannWhitneyU(one, "coh", "v").collect().head
    assert(r.getAs[Long]("n_b") == 0)
    assert(r.isNullAt(r.fieldIndex("z")), r.toString)
  }

  test("mannWhitneyU: hand-computed no-tie and tied cases") {
    import graft.pipeline.Profiler
    // A = {1,3,5}, B = {2,4}: ranks A = 1,3,5 -> R_A = 9,
    // U_A = 9 - 3*4/2 = 3; mu = 3; var = 3*2*6/12 = 3
    val df = Seq((0, 1L), (0, 3L), (0, 5L), (1, 2L), (1, 4L))
      .toDF("coh", "v")
    val r = Profiler.mannWhitneyU(df, "coh", "v").collect().head
    assert(r.getAs[Double]("u_a") == 3.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("kruskalWallis: H equals z² for two groups (shared tie " +
    "correction), and all-tied input yields null h") {
    import graft.pipeline.Profiler
    val rnd = new scala.util.Random(7)
    val df = Seq.tabulate(60)(i =>
      (i % 2, rnd.nextInt(9).toLong)).toDF("coh", "v")
    val z = Profiler.mannWhitneyU(df, "coh", "v")
      .collect().head.getAs[Double]("z")
    val h = Profiler.kruskalWallis(df, "coh", "v")
      .collect().head.getAs[Double]("h")
    assert(math.abs(h - z * z) < 1e-4, s"H=$h z^2=${z * z}")
    val tied = Seq.tabulate(10)(i => (i % 2, 5L)).toDF("coh", "v")
    val rt = Profiler.kruskalWallis(tied, "coh", "v").collect().head
    assert(rt.isNullAt(rt.fieldIndex("h")), rt.toString)
  }

  test("anovaF: single group and saturated (n == k) inputs " +
    "null-propagate f_stat") {
    import graft.pipeline.Profiler
    val single = Seq.tabulate(6)(i => ("g", i.toLong)).toDF("g", "v")
    val r1 = Profiler.anovaF(single, "g", "v").collect().head
    assert(r1.getAs[Long]("k") == 1)
    assert(r1.isNullAt(r1.fieldIndex("f_stat")), r1.toString)
    val saturated = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("g", "v")
    val r2 = Profiler.anovaF(saturated, "g", "v").collect().head
    assert(r2.getAs[Long]("k") == 3 && r2.getAs[Long]("n") == 3)
    assert(r2.isNullAt(r2.fieldIndex("f_stat")), r2.toString)
  }

  test("mannKendall: constant series drops (varS = 0 filter); " +
    "monotone series z is antisymmetric under negation") {
    import graft.pipeline.Profiler
    val const = Seq.tabulate(12)(i => ("s", i.toLong, 5L))
      .toDF("g", "b", "v")
    assert(Profiler.mannKendall(const, "g", "b", "v").collect().isEmpty)
    val up = Seq.tabulate(12)(i => ("s", i.toLong, i.toLong))
      .toDF("g", "b", "v")
    val down = Seq.tabulate(12)(i => ("s", i.toLong, -i.toLong))
      .toDF("g", "b", "v")
    val zu = Profiler.mannKendall(up, "g", "b", "v")
      .collect().head.getAs[Double]("z")
    val zd = Profiler.mannKendall(down, "g", "b", "v")
      .collect().head.getAs[Double]("z")
    assert(zu > 0 && zd == -zu, s"zu=$zu zd=$zd")
  }

  test("effectiveSampleSize: constant series null-propagates rho/ess; " +
    "ess stays positive on a mixed series") {
    import graft.pipeline.Profiler
    val const = Seq.tabulate(16)(i => ("s", i.toLong, 3.0))
      .toDF("g", "t", "v")
    val rc = Profiler.effectiveSampleSize(const, "g", "t", "v")
      .collect().head
    assert(rc.isNullAt(rc.fieldIndex("rho1")), rc.toString)
    assert(rc.isNullAt(rc.fieldIndex("ess")), rc.toString)
    val mixed = Seq.tabulate(32)(i =>
      ("s", i.toLong, if (i % 2 == 0) 1.0 else 2.0)).toDF("g", "t", "v")
    val rm = Profiler.effectiveSampleSize(mixed, "g", "t", "v")
      .collect().head
    assert(!rm.isNullAt(rm.fieldIndex("ess")))
  }

  test("diffInDiff: an empty cell null-propagates its mean and did") {
    import graft.pipeline.Profiler
    // no control-post rows at all
    val df = Seq((1, 1, 10L), (1, 0, 5L), (0, 0, 4L)).toDF("t", "p", "v")
    val r = Profiler.diffInDiff(df, "t", "p", "v").collect().head
    assert(r.getAs[Long]("n01") == 0)
    assert(r.isNullAt(r.fieldIndex("mean_ctrl_post")), r.toString)
    assert(r.isNullAt(r.fieldIndex("did")), r.toString)
  }

  test("twoProportionZ: saturated conversion (p-hat = 1) yields null z") {
    import graft.pipeline.Profiler
    val df = Seq((1, 1), (1, 1), (0, 1), (0, 1)).toDF("g", "s")
    val r = Profiler.twoProportionZ(df, "g", "s").collect().head
    assert(r.isNullAt(r.fieldIndex("z")), r.toString)
  }

  test("symEdgeTable is built once per (session, corpus, params) and " +
    "carries both edge directions plus self-loops") {
    val docs = Tables.documents(spark, sf)
    val a = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5, sf)
    val b = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5, sf)
    // same persisted table on both calls — the construction ran once
    // (warehouse tier, see ArtifactWarehouseSpec)
    assert(a.inputFiles.sorted.toSeq == b.inputFiles.sorted.toSeq &&
      a.inputFiles.nonEmpty)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1)))
    val loops = rows.filter(r => r._1 == r._2).map(_._1).toSet
    val edges = rows.filter(r => r._1 != r._2)
    // symmetric: every (s,d) has (d,s)
    edges.foreach { case (s, d) =>
      assert(rows.contains((d, s)), s"missing reverse of ($s,$d)") }
    // every edge endpoint has a self-loop
    edges.foreach { case (s, d) =>
      assert(loops.contains(s) && loops.contains(d)) }
  }

  test("SimilarityArtifacts.kmeansAssignments ≡ kmeansAssign and is " +
    "materialized once") {
    import graft.pipeline.{Similarity, SimilarityArtifacts}
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val direct = Similarity.kmeansAssign(e, k = 8, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val a = SimilarityArtifacts.kmeansAssignments(e, 8, 2, corpusKey = sf)
    val b = SimilarityArtifacts.kmeansAssignments(e, 8, 2, corpusKey = sf)
    // one training per (corpus fingerprint, k, iters): both calls
    // resolve ONE registered (and cached) warehouse table
    assert(spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_wh_kmeans_assign_")) >= 1)
    assert(b.collect().length == a.collect().length)
    val shared = a.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(shared.toSeq == direct.toSeq)
    assert(shared.nonEmpty)
  }

  test("tfidfTopKShared ≡ tfidfTopK on the documents corpus " +
    "(artifact built once)") {
    import graft.pipeline.{TextAnalysis, TextArtifacts}
    val docs = Tables.documents(spark, sf)
    val inline = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val shared = TextAnalysis.tfidfTopKShared(
        docs, "doc_id", "text", corpusKey = sf, k = 3)
      .orderBy("id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(shared.toSeq == inline.toSeq)
    assert(shared.nonEmpty)
    val a = TextArtifacts.termFreq(docs, "doc_id", "text", sf)
    val b = TextArtifacts.termFreq(docs, "doc_id", "text", sf)
    // one materialization per (corpus fingerprint, params): same
    // persisted table files (warehouse tier, see ArtifactWarehouseSpec)
    assert(a.inputFiles.sorted.toSeq == b.inputFiles.sorted.toSeq &&
      a.inputFiles.nonEmpty)
  }

  test("bm25TopKShared ≡ bm25TopK on the documents corpus") {
    import graft.pipeline.TextAnalysis
    val docs = Tables.documents(spark, sf)
    val terms = Seq("spark", "hash", "window")
    val inline = TextAnalysis.bm25TopK(docs, "doc_id", "text", terms)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val shared = TextAnalysis.bm25TopKShared(
        docs, "doc_id", "text", corpusKey = sf, queryTerms = terms)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(shared.toSeq == inline.toSeq)
    assert(shared.nonEmpty)
  }

  test("bm25TopKShared ≡ bm25TopK when a query term is absent from " +
    "the corpus and when docs have empty text") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      (1L, "spark hash spark"), (2L, ""), (3L, "   "),
      (4L, "window spark"), (5L, "hash hash window"))
      .toDF("doc_id", "text")
    val terms = Seq("spark", "zzz_absent", "window")
    val key = "mem:degenerate-bm25"
    val inline = TextAnalysis.bm25TopK(docs, "doc_id", "text", terms)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val shared = TextAnalysis.bm25TopKShared(
        docs, "doc_id", "text", corpusKey = key, queryTerms = terms)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(shared.toSeq == inline.toSeq)
    val tfidfInline = TextAnalysis.tfidfTopK(docs, "doc_id", "text", 2)
      .orderBy("id", "rank").collect().map(_.toSeq)
    val tfidfShared = TextAnalysis.tfidfTopKShared(
        docs, "doc_id", "text", corpusKey = key, k = 2)
      .orderBy("id", "rank").collect().map(_.toSeq)
    assert(tfidfShared.toSeq == tfidfInline.toSeq)
  }

  test("SimilarityArtifacts cache key discriminates k and iters") {
    import graft.pipeline.SimilarityArtifacts
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val k8 = SimilarityArtifacts.kmeansAssignments(e, 8, 2, corpusKey = sf)
    val k4 = SimilarityArtifacts.kmeansAssignments(e, 4, 2, corpusKey = sf)
    val k8i1 = SimilarityArtifacts.kmeansAssignments(e, 8, 1, corpusKey = sf)
    assert(!(k8 eq k4) && !(k8 eq k8i1))
    assert(k4.select(max(col("cluster"))).head.getInt(0) <= 3)
  }

  test("TextArtifacts docFreq/docLengths agree with direct aggregates " +
    "over the corpus") {
    import graft.pipeline.{TextAnalysis, TextArtifacts}
    val docs = Tables.documents(spark, sf)
    val tfDirect = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.whitespaceTokens(lower(col("text"))))
          .as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfDirect = tfDirect.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1)))
    val dfShared = TextArtifacts.docFreq(docs, "doc_id", "text", sf)
      .orderBy("token").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dfShared.toSeq == dfDirect.toSeq)
    val lensDirect = tfDirect.groupBy("id").agg(sum(col("tf")).as("len"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lensShared = TextArtifacts.docLengths(docs, "doc_id", "text", sf)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lensShared.toSeq == lensDirect.toSeq)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off ~sf1 synthetic-data generator (r13 verdict item #4): the
  * driver's testdata stops at sf0.1, so the 100×-scale claims of the
  * headline pipeline families were argued structurally from plan
  * shapes. This tool draws a 10×-sf0.1 (~sf1) dataset with the same
  * schemas and distribution SHAPE as the driver's tables — documents
  * (word-salad text with a near-dup fraction), embeddings (centroid +
  * noise per label), events (users × types over a month), lineitem
  * (the TPC-H-ish columns the stats family reads) — so the registry
  * queries run on it unchanged via their `(spark, dir)` signature.
  *
  * Deterministic AND distributed: every cell derives from
  * splittable-hash math over the row id (no sequential RNG), so any
  * partitioning of the id range generates identical data.
  *
  * Usage: `sbt "runMain graft.tools.ScaleGen /tmp/graft_sf1 10"`
  * (multiplier relative to sf0.1 row counts). NEVER writes to
  * /root/testdata.
  */
object ScaleGen {

  // splittable hash (splitmix64 finalizer) — the per-cell entropy source
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
  private def h(id: Long, field: Long): Long = mix(mix(id) ^ field)
  // floorMod, not .abs % — the truncated Int can be Int.MinValue, whose
  // .abs stays negative and would yield a negative array index (~1% odds
  // per 5e7 draws at mult=10)
  private def idx(v: Long, k: Int): Int = Math.floorMod((v >>> 8).toInt, k)
  private def u01(id: Long, field: Long): Double =
    (h(id, field) >>> 11).toDouble / (1L << 53).toDouble

  private val Vocab: Array[String] = Array(
    "spark", "table", "column", "line", "part", "order", "batch",
    "query", "scan", "sort", "hash", "group", "value", "filter",
    "stream", "vector", "agg", "key", "fast", "slow", "small", "large",
    "join", "index", "cache", "merge", "split", "read", "write",
    "customer", "supplier", "window", "frame", "plan", "stage", "task")

  /** Vocabulary grows ~cbrt with the corpus (Heaps-law-ish), keeping
    * the 3-gram shingle collision density roughly SCALE-INVARIANT like
    * a real corpus: with a fixed vocab the shingle space saturates and
    * candidate-pair counts explode quadratically as a DATA artifact,
    * which would mask (or fake) engine super-linearity in the probe.
    */
  private def docWords(id: Long, mult: Int): Array[String] = {
    val suffixes = math.max(1, math.ceil(
      math.cbrt(27500.0 * mult) / Vocab.length).toInt)
    val n = 40 + (h(id, 1) % 21).toInt.abs // 40..60 words
    Array.tabulate(n) { i =>
      val base = Vocab(idx(h(id, 100 + i), Vocab.length))
      val s = idx(h(id, 1000 + i), suffixes)
      // suffix 0 stays the BARE word: the base vocabulary must exist at
      // every scale (fixed-term queries like q135's BM25 keywords match
      // real corpora, where scaling up never deletes common words)
      if (s == 0) base else base + s
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: ScaleGen <outDir> [multiplier]")
    val out = args(0)
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt)
    import spark.implicits._

    val nDocs = 5000L * mult
    val nEmb = 2000L * mult
    val nEvents = 100000L * mult
    val nLineitem = 600000L * mult

    // documents: word salad; ~2% of rows are NEAR-DUPS of their
    // predecessor (one word swapped) — the dedup families need a real
    // duplicate population at scale, like the driver's draw
    spark.range(nDocs).map { id =>
      val isDup = id > 0 && u01(id, 2) < 0.02
      val words = docWords(if (isDup) id - 1 else id, mult)
      if (isDup) words(idx(h(id, 3), words.length)) = "dupmark"
      val text = words.mkString(" ")
      val langs = Array("en", "en", "en", "de", "fr", "zh", "es")
      val lang = langs(idx(h(id, 4), 7))
      val source = s"src${idx(h(id, 5), 20)}"
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: 64-dim, 10 label clusters (centroid + noise) — the
    // geometry the ANN/k-means families expect
    spark.range(nEmb).map { id =>
      val label = idx(h(id, 6), 10)
      val emb = Array.tabulate(64) { d =>
        val centroid = ((h(label.toLong, 200 + d) % 1000) / 500.0).toFloat
        val noise = ((u01(id, 300 + d) - 0.5) * 0.6).toFloat
        centroid + noise
      }
      (id, emb, label)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events: one month, users scale with sf, 5 types
    val baseUs = 1704067200000000L // 2024-01-01
    val spanUs = 30L * 86400 * 1000000
    val nUsers = 1500L * mult
    spark.range(nEvents).map { id =>
      val ts = new java.sql.Timestamp(
        (baseUs + (u01(id, 7) * spanUs).toLong) / 1000)
      val user = (h(id, 8) >>> 8) % nUsers
      val types = Array("view", "click", "purchase", "signup", "error")
      val et = types(idx(h(id, 9), 5))
      val value = math.rint(u01(id, 10) * 10000) / 100.0
      (id, ts, user, et, value, s"""{"k":${(h(id, 11) >>> 8) % 100}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // lineitem: the columns the stats family reads, TPC-H-ish ranges
    spark.range(nLineitem).map { id =>
      val qty = 1.0 + (h(id, 12) >>> 8) % 50
      val price = math.rint(qty * (900 + (h(id, 13) >>> 8) % 1200) * 100) / 100.0
      val disc = ((h(id, 14) >>> 8) % 11).toDouble / 100.0
      val tax = ((h(id, 15) >>> 8) % 9).toDouble / 100.0
      val ship = new java.sql.Timestamp(
        694224000000L + ((h(id, 16) >>> 8) % (2500L * 86400)) * 1000)
      (id / 4, 1 + (h(id, 17) >>> 8) % (20000L * mult),
        1 + (h(id, 18) >>> 8) % (1000L * mult), (id % 4).toInt + 1,
        qty, price, disc, tax,
        Seq("A", "N", "R")(idx(h(id, 19), 3)),
        Seq("O", "F")(idx(h(id, 20), 2)), ship)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // TPC-H-ish dims + orders (r15 verdict item 5: the WHOLE registry
    // must probe at scale, not a hand-picked subset) — same schemas,
    // key ranges and value shapes as the driver tables; keys 0-based
    // like the driver's, sized so every lineitem foreign key resolves
    val nOrders = nLineitem / 4
    val nCustomers = 15000L * mult
    spark.range(nOrders).map { id =>
      val total = math.rint((1000.0 + u01(id, 21) * 499000.0) * 100) / 100.0
      val od = new java.sql.Timestamp(
        788918400000L + ((h(id, 22) >>> 8) % (2400L * 86400)) * 1000)
      (id, (h(id, 23) >>> 8) % nCustomers,
        Seq("O", "F", "P")(idx(h(id, 24), 3)), total, od,
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")(idx(h(id, 25), 5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    spark.range(nCustomers).map { id =>
      (id, f"Customer#$id%09d", idx(h(id, 26), 25),
        math.rint((u01(id, 27) * 11000.0 - 1000.0) * 100) / 100.0,
        Seq("MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD",
          "AUTOMOBILE")(idx(h(id, 28), 5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // +1 so lineitem's 1-based `1 + h % (1000*mult)` keys all resolve
    spark.range(1000L * mult + 1).map { id =>
      (id, f"Supplier#$id%09d", idx(h(id, 29), 25),
        math.rint(u01(id, 30) * 10000.0 * 100) / 100.0)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    spark.range(20000L * mult + 1).map { id =>
      val adjs = Array("small", "red", "blue", "hot", "old", "big")
      val nouns = Array("ring", "widget", "bolt", "gear", "gizmo")
      (id, s"${adjs(idx(h(id, 31), 6))} ${nouns(idx(h(id, 32), 5))}",
        s"Brand#${idx(h(id, 33), 25)}",
        Seq("ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL",
          "PROMO")(idx(h(id, 34), 6)),
        1 + idx(h(id, 35), 50),
        math.rint((900.0 + u01(id, 36) * 100.0) * 100) / 100.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$out/region.parquet")
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$out/nation.parquet")

    println(s"""{"generated":"$out","mult":$mult,"documents":$nDocs,""" +
      s""""embeddings":$nEmb,"events":$nEvents,"lineitem":$nLineitem,""" +
      s""""orders":$nOrders,"customers":$nCustomers}""")
    spark.stop()
  }
}

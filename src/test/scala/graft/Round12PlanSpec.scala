package graft

import graft.pipeline.DedupArtifacts
import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-12 dedup-artifact layout: the CC
  * propagation join over the persisted pair graph must read the
  * dst-bucketed table with ZERO Exchange on the edge side — the
  * pay-the-shuffle-once-at-write-time contract
  * ([[graft.store.Bucketing]], r10 verdict item #7).
  */
class Round12PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  test("CC first iteration reads the pre-bucketed pair graph with no " +
    "Exchange on the edge side (SMJ regime)") {
    // pin the 100 TB regime: when the label frame outgrows broadcast,
    // the propagation join is a sort-merge join — the bucketed layout
    // must contribute its side shuffle-free AND sort-free (buckets are
    // written sorted). At broadcast scale bucketing is moot (the labels
    // ship; neither side shuffles), which is why the pin disables it.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = Tables.documents(s2, sf)
    val sym = DedupArtifacts.symEdgeTable(docs, "doc_id", "text", 3, 0.5,
      corpusKey = s"$sf#smjpin")
    // the exact first-iteration propagation join shape of Dedup.ccLoop
    val labels = sym.filter(col("src") === col("dst"))
      .select(col("src").as("id"), col("src").as("cluster_id"))
      .localCheckpoint(true)
    val firstIter = sym
      .join(labels.select(col("id").as("dst"), col("cluster_id")), "dst")
    val plan = planOf(firstIter)
    // the edge side is a bucketed scan …
    assert(plan.contains("SelectedBucketsCount"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    // … and the ONLY exchange is the labels side being co-bucketed;
    // the persisted layout itself never re-shuffles. (A shuffle-FREE
    // in-partition Sort remains above the bucketed scan: since Spark
    // 3.0 a bucketed scan no longer advertises per-bucket order
    // without the legacy outputOrdering flag — the sort it forces is
    // partition-local and cheap; the Exchange is what the layout
    // eliminates.)
    assert(countOccurrences(plan, "Exchange") == 1, plan)
  }

  test("streaming boundedResult is a driver-local relation: actions " +
    "pay one local sort, never a range-sampling job or an Exchange") {
    // r11 streaming-overhead item: the memory-sink re-materialization
    // used to end in a global orderBy, whose RangePartitioning costs a
    // separate sampling Spark job PLUS an exchange on EVERY downstream
    // action — ~0.5 s of each bounded streaming query's ~2 s warm
    // time. The helper returns the bounded answer as a LocalRelation
    // with a partition-local sort, so the plan must show no Exchange
    // and no global Sort.
    val df = SparkEntry.queries("q32_stream_window")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
    // the declared order is still applied (partition-local sort)
    assert(plan.contains("Sort ["), plan)
    assert(df.count() > 0)
  }

  test("tfidfTopKShared's tf⋈df attach reads both co-bucketed text " +
    "artifacts with zero Exchange below the rank window") {
    // the TextArtifacts contract: term-frequency and vocabulary tables
    // are written token-bucketed with the same bucket count, so the
    // classic df-attach join — the only corpus-sized join TF-IDF has —
    // plans bucket-to-bucket. The lone Exchange in the whole query is
    // the per-document rank window's hashpartitioning(id).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = Tables.documents(s2, sf)
    val out = graft.pipeline.TextAnalysis.tfidfTopKShared(
      docs, "doc_id", "text", corpusKey = s"$sf#tfidfpin")
    val plan = planOf(out)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    // the ONLY row-moving shuffle is the rank window's id partitioning;
    // the token join never exchanges (both scans are bucketed). The
    // 1-row N aggregate's SinglePartition/Broadcast exchanges move one
    // row and don't count against the layout.
    val rowShuffles = "Exchange hashpartitioning\\(\\w+".r
      .findAllMatchIn(plan).map(_.matched).toList
    assert(rowShuffles == List("Exchange hashpartitioning(id"), plan)
  }

  test("kmeansAssignments serves the materialized assignment table — " +
    "no Lloyd explode/aggregate in a consumer's plan") {
    // the SimilarityArtifacts contract: consumers read the trained
    // integer assignment table as a local scan; retraining (posexplode
    // over vectors + (cluster, position) aggregate + driver collect)
    // never re-enters any consuming query's plan.
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val assigned = graft.pipeline.SimilarityArtifacts
      .kmeansAssignments(e, 8, 2, corpusKey = s"$sf#kmpin")
    val plan = planOf(assigned.groupBy(col("cluster")).count())
    // r14: the artifact is a warehouse PARQUET table (survives the
    // session) — the consumer scans the tiny (vec_id, cluster) table,
    // never the embeddings corpus, and never retrains
    assert(!plan.contains("posexplode"), plan)
    assert(!plan.contains("embeddings"), plan) // no corpus re-scan
    assert(plan.contains("graft_warehouse"), plan) // the artifact scan
  }

  test("bm25TopKShared probes the bucketed term-frequency table with " +
    "literal-term bucket pruning") {
    // a 3-term probe against the token-bucketed tf table must not scan
    // every bucket: the isin predicate prunes to the terms' buckets at
    // scan time (SelectedBucketsCount < total), and no token explosion
    // or corpus-wide aggregation appears anywhere in the plan.
    val docs = Tables.documents(spark, sf)
    val out = graft.pipeline.TextAnalysis.bm25TopKShared(
      docs, "doc_id", "text", corpusKey = s"$sf#bm25pin",
      queryTerms = Seq("spark", "hash", "window"))
    val plan = planOf(out)
    assert(!plan.contains("Generate"), plan) // no explode left
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val hits = sel.findAllMatchIn(plan).map(m =>
      (m.group(1).toInt, m.group(2).toInt)).toList
    assert(hits.nonEmpty, plan)
    assert(hits.exists { case (k, n) => k < n }, plan)
    assert(out.count() > 0)
  }
}

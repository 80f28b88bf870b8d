package graft

import graft.adapters.EventsAdapter
import graft.pipeline.{Behavior, Profiler}
import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-11 operator family — the scale
  * properties: stats tests stay single-aggregate map-side-combined,
  * Adamic–Adar mints pairs by scan-stage explode (no self-join), the
  * rank machinery keeps its bounded windows, sequential filters plan
  * as one series-keyed exchange + in-partition sort.
  */
class Round11PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  test("anovaF is two stacked aggregates, no join, no window") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 1000.0).cast("long").as("vq"))
    val plan = planOf(Profiler.anovaF(ev, "event_type", "vq"))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // per-group partial+final, then the one-row rollup
    assert(countOccurrences(plan, "HashAggregate") >= 3, plan)
  }

  test("adamicAdar mints pairs by explode — no self-join of baskets") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val plan = planOf(Behavior.adamicAdar(li, "l_orderkey",
      "l_partkey"))
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
    // top-k cut is the distributed TakeOrderedAndProject, not a sort
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mannWhitneyU runs on the distinct-value grid (one row out)") {
    val ev = Tables.events(spark, sf)
      .select((col("user_id") % 2).as("coh"),
        floor(col("value") * 1000.0).cast("long").as("vq"))
    val df = Profiler.mannWhitneyU(ev, "coh", "vq")
    val plan = planOf(df)
    assert(!plan.contains("Join"), plan)
    // the only window is the bounded distinct-value cumsum
    assert(countOccurrences(plan, "Window") == 1, plan)
  }

  test("Kalman plans as one series exchange + in-partition sort") {
    val df = graft.operators.Kalman.filterLast(
      EventsAdapter.samples(spark, sf)
        .select(col("sensor_id"), col("timestamp_us"), col("value")))
    val plan = planOf(df)
    // repartition(sensor) then sortWithinPartitions — a local Sort,
    // never a global one
    assert(plan.contains("Exchange hashpartitioning(sensor_id"), plan)
    assert(plan.contains("Sort [sensor_id"), plan)
    assert(!plan.contains("Sort [sensor_id#") ||
      plan.contains("false, 0"), plan) // local sort flag
  }

  test("distributionOverlap joins histograms, not rows") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), expr("n_chars div 100").as("bk"))
    val df = Profiler.distributionOverlap(docs, "source", "bk")
    val qe = df.queryExecution.optimizedPlan.toString
    // both join inputs are aggregates (the bounded histograms)
    assert(qe.contains("Join"), qe)
    val joinIdx = qe.indexOf("Join")
    val below = qe.substring(joinIdx)
    assert(below.contains("Aggregate"), qe)
  }

  test("mixRateDecomposition: one cell aggregate + 1-row broadcast") {
    val ev = Tables.events(spark, sf)
      .select((col("user_id") % 2).as("coh"), col("event_type"),
        floor(col("value") * 1000.0).cast("long").as("vq"))
    val plan = planOf(Profiler.mixRateDecomposition(
      ev, "coh", "event_type", "vq"))
    // the only join is the broadcast of the 1-row totals
    assert(countOccurrences(plan, "BroadcastNestedLoopJoin") <= 1,
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("topNOtherRollup: winners arrive by broadcast, never a shuffle join") {
    val df = Seq(("a", 10L), ("b", 5L), ("c", 1L)).toDF("k", "v")
    val plan = planOf(Profiler.topNOtherRollup(df, "k", "v", 2))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("contractAudit evaluates all rules in ONE aggregate pass") {
    import graft.pipeline.Governance
    val docs = Tables.documents(spark, sf)
    val df = Governance.contractAudit(docs, Seq(
      "a" -> col("text").isNotNull, "b" -> (col("n_chars") >= 0)))
    val plan = planOf(df)
    // one scan; the stack() unpivot adds a Generate, never extra scans
    assert(countOccurrences(plan, "FileScan") +
      countOccurrences(plan, "Scan parquet") <= 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("ksBhFdr: BH pass is windows over the groups table only") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        floor(col("value") * 1000.0).cast("long").as("vq"))
    val df = Profiler.ksBhFdr(ev, "event_type", "vq")
    // executes and produces one row per group with adj >= raw
    val rows = df.collect()
    assert(rows.length >= 2)
    rows.foreach(r => assert(
      r.getAs[Double]("p_adj") >= r.getAs[Double]("p_raw")))
  }
}

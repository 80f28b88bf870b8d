package graft

import graft.pipeline.{Profiler, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Physical-plan pins for the round-10 operator family — the scale
  * properties, not the results: the Gram aggregator shuffles buffers
  * (ObjectHashAggregate) instead of exploded products, the star join
  * broadcasts its dims, scan-stage ops stay shuffle-free, aggregates
  * keep their map-side partial step.
  */
class Round10PlanSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(plan: String, token: String): Int =
    plan.sliding(token.length).count(_ == token)

  test("gramMatrix aggregates via object-hash buffers, not an exploded join") {
    val e = Tables.embeddings(spark, sf)
    val plan = planOf(Similarity.gramMatrix(e, "embedding"))
    // the typed Aggregator runs as ObjectHashAggregate with a partial
    // step (map-side combine of the d(d+1)/2 buffers)
    assert(plan.contains("ObjectHashAggregate"), plan)
    // no join against the vectors themselves — the only join is the
    // bounded idx->(i,j) broadcast mapping
    assert(countOccurrences(plan, "BroadcastHashJoin") == 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("quantCalibration is one generate + one d-group aggregate") {
    val e = Tables.embeddings(spark, sf)
    val plan = planOf(Similarity.quantCalibration(e, "embedding"))
    assert(plan.contains("Generate posexplode"), plan)
    // partial + final hash aggregate around a single exchange
    assert(countOccurrences(plan, "HashAggregate") >= 2, plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan)
  }

  test("featureHash: explode feeds one partial-aggregated shuffle, no join") {
    val docs = Tables.documents(spark, sf)
    val plan = planOf(TextAnalysis.featureHash(docs, "doc_id", "text", 64))
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("Join"), plan)
    // map-side partial + final (ignore AQE stage wrappers): at least
    // two HashAggregate operators around the (doc, bucket) exchange
    assert(countOccurrences(plan, "HashAggregate") >= 2, plan)
  }

  test("star join broadcasts nation and region dims") {
    val plan = planOf(Queries.all("q297_star_join")(spark, sf))
    assert(countOccurrences(plan, "BroadcastHashJoin") >= 2, plan)
  }

  test("bitmapDistinct lane aggregate keeps its partial step") {
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val plan = planOf(Profiler.bitmapDistinct(ev, "day", "user_id"))
    // bit_or lane combine is a hash aggregate with partial_bit_or
    assert(plan.toLowerCase.contains("partial_bit_or") ||
      plan.contains("bit_or"), plan)
  }

  test("refIntegrity joins at key cardinality (aggregates below the join)") {
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val df = Profiler.refIntegrity(Seq(("c->p", child, "fk", parent, "pk")))
    val qe = df.queryExecution.optimizedPlan.toString
    // the child aggregate (distinct keys + counts) sits BELOW the join
    // in the optimized plan: Aggregate appears as a join child
    assert(qe.contains("Join LeftOuter"), qe)
    assert(qe.contains("Aggregate"), qe)
  }

  test("asOfNative plans as AsOfJoinExec with one exchange+sort per side") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, 1.0)).toDF("k", "t", "lv")
    val r = Seq((1L, 9L, 5.0)).toDF("k", "t", "rv")
    val plan = planOf(AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv")))
    assert(plan.contains("AsOfJoin"), plan)
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 2, plan)
    assert(!plan.contains("Window"), plan) // no union+carry machinery
  }

  test("asOfNative output partitioning feeds a per-key agg with no new exchange") {
    import graft.operators.AsOfJoin
    val l = Seq((1L, 10L, 1.0)).toDF("k", "t", "lv")
    val r = Seq((1L, 9L, 5.0)).toDF("k", "t", "rv")
    val agg = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rv"))
      .groupBy(col("k")).agg(sum(col("rv")))
    val plan = planOf(agg)
    // the aggregate reuses the join's key partitioning: still only the
    // join's two exchanges
    assert(countOccurrences(plan, "Exchange hashpartitioning") == 2, plan)
  }

  test("boilerplatePrefixes prunes to (source, text) at the scan") {
    val docs = Tables.documents(spark, sf)
    val plan = planOf(TextAnalysis.boilerplatePrefixes(docs, "text", "source"))
    assert(plan.contains("ReadSchema"), plan)
    val read = plan.split("ReadSchema:")(1).split("\n")(0)
    assert(read.contains("text") && read.contains("source") &&
      !read.contains("lang") && !read.contains("n_chars"), read)
  }
}

package graft

import graft.plans.Lineage
import org.apache.spark.sql.functions._

/** Column-lineage introspection: outputs trace to the right source
  * columns through projects, aggregates, joins, windows, unions, and
  * the custom as-of node.
  */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("aggregate over a join traces measures and keys to sources") {
    val df = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(sum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n"))
    val l = Lineage.columnLineage(df)
    assert(l("segment").exists(_.endsWith(".c_mktsegment")), l)
    assert(l("revenue").exists(_.endsWith(".o_totalprice")), l)
    assert(!l("revenue").exists(_.endsWith(".c_mktsegment")), l)
    assert(l("n") == Set.empty, l) // count(1) touches no source column
  }

  test("expressions combine lineages; filters do not taint outputs") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R")
      .select((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("net"))
    val l = Lineage.columnLineage(df)
    assert(l("net").exists(_.endsWith(".l_extendedprice")), l)
    assert(l("net").exists(_.endsWith(".l_discount")), l)
    assert(!l("net").exists(_.endsWith(".l_returnflag")), l)
  }

  test("window columns depend on their inputs; union merges positionally") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val win = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
    val lw = Lineage.columnLineage(win)
    assert(lw("rk").exists(_.endsWith(".o_custkey")), lw)
    assert(lw("rk").exists(_.endsWith(".o_orderdate")), lw)

    val u = Tables.orders(spark, sf).select(col("o_totalprice").as("v"))
      .unionAll(Tables.lineitem(spark, sf)
        .select(col("l_extendedprice").as("v")))
    val lu = Lineage.columnLineage(u)
    assert(lu("v").exists(_.endsWith(".o_totalprice")), lu)
    assert(lu("v").exists(_.endsWith(".l_extendedprice")), lu)
  }

  test("custom as-of node: carried columns trace conservatively") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").as("pv"))
    val clicks = ev.filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").as("cv"))
    val joined = graft.operators.AsOfJoin.asOfNative(
      purchases, clicks, "user_id", "ts_us", Seq("cv"))
    val lin = Lineage.columnLineage(joined)
    // left payload keeps its precise lineage
    assert(lin("pv").exists(_.endsWith(".value")), lin)
    // produced attrs trace conservatively to the node's references
    assert(lin("right_ts").nonEmpty && lin("cv").nonEmpty, lin)
  }
}

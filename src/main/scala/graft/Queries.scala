package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry of driver-checked queries.
  *
  * Conventions for oracle (DuckDB) hash parity:
  *  - every computed column is aliased identically on both sides;
  *  - result rows carry an unambiguous ORDER BY on both sides;
  *  - double aggregates are computed over exact DECIMAL casts and only
  *    converted back to DOUBLE at the end, so the sum is associative and
  *    bitwise identical regardless of partitioning / evaluation order.
  */
object Queries {

  private case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle.stripMargin))

  private def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, None)

  /** Exact sum of a 2-decimal-valued DOUBLE column: cast each value to
    * DECIMAL(18,2) (exact for the generated data), sum in decimal, return
    * DOUBLE. Same construction is used verbatim in the oracle SQL.
    */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  private val registry: Seq[Q] = Seq(

    // ---------------------------------------------------------------------
    // A1-flavor aggregation (SURVEY §2.5): group-by with exact-decimal sums.
    q(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus"""
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  lazy val all: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(x => x.name -> x.fn).toMap

  lazy val oracles: Map[String, String] =
    registry.flatMap(x => x.oracle.map(x.name -> _)).toMap
}

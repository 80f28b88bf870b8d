package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation: the slope of a series is the
  * MEDIAN of all pairwise slopes (y_b − y_a)/(t_b − t_a), t_a < t_b —
  * a 29%-breakdown-point alternative to OLS that one outlying point
  * cannot drag (Sen 1968; the regression twin of the q103/q148 MAD
  * discipline).
  *
  * Scale shape: pairwise slopes are per-GROUP O(n²), so the operator
  * contract is PRE-AGGREGATED series (daily/monthly rollups — the
  * q224 trend input shape), where n is bounded (hundreds to low
  * thousands) and the pair fan-out is a within-group self-join on the
  * grouping key: one shuffle, pairs never cross groups, and the
  * downstream window runs on the same key partitioning. The corpus-
  * scale work (collapsing raw rows to the series) happens upstream at
  * ordinary aggregate cost.
  *
  * Exactness: each slope is ONE IEEE division of exact integer-valued
  * deltas; the median is an explicit two-middle-rank selection
  * (row_number over a fully deterministic (slope, t_a, t_b) order)
  * averaged as sum/count — a single commutative add of at most two
  * doubles plus one division — so the surface replays bit-identically
  * off-engine. Rank ties at the median boundary carry equal slope
  * values by construction, so the tie order cannot change the answer.
  */
object TheilSen {

  def robustSlope(
      series: DataFrame, // one row per (group, t) — t, y integer-valued
      groupCol: String,
      tCol: String,
      yCol: String): DataFrame = {
    val a = series.select(col(groupCol).as("g"),
      col(tCol).cast("long").as("ta"), col(yCol).cast("long").as("ya"))
    val b = series.select(col(groupCol).as("g"),
      col(tCol).cast("long").as("tb"), col(yCol).cast("long").as("yb"))
    val pairs = a.join(b, Seq("g"))
      .filter(col("ta") < col("tb"))
      .withColumn("slope",
        (col("yb") - col("ya")).cast("double") /
          (col("tb") - col("ta")).cast("double"))
    val order = Window.partitionBy(col("g"))
      .orderBy(col("slope"), col("ta"), col("tb"))
    val whole = Window.partitionBy(col("g"))
    pairs
      .withColumn("rn", row_number().over(order))
      .withColumn("np", count(lit(1)).over(whole))
      .filter(col("rn") === expr("(np + 1) DIV 2") ||
        col("rn") === expr("(np + 2) DIV 2"))
      .groupBy(col("g"))
      .agg(max(col("np")).as("n_pairs"),
        (sum(col("slope")) / count(lit(1)).cast("double"))
          .as("theil_sen"))
      .select(col("g").as(groupCol), col("n_pairs"), col("theil_sen"))
      .orderBy(groupCol)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) regression of a bucketed series
  * per group — the shape-constrained fit behind calibration curves
  * and dose-response monotonization. Instead of the sequential PAVA
  * stack (which would need a per-group fold), this uses the CLOSED
  * FORM of the isotonic fit:
  *
  *   ŷᵢ = max_{k≤i} min_{j≥i} mean(y_k..y_j)
  *
  * — an O(B³)-per-group join over the BUCKET table (B buckets, e.g.
  * 24 hours), which is a constant, never row-sized: the data reduces
  * to (group, bucket) integer means first, and the cubic blowup is
  * 24³ rows per group. A declarative plan Catalyst can shuffle/prune
  * freely — no stack, no recursion, no UDF.
  *
  * Exactness: bucket values are floor-division integer means (the
  * q337 discipline); interval means are ONE division of exact
  * integers each — identical doubles on any engine — and min/max
  * selection over identical doubles is order-free. ROUND(6) surface.
  */
object Isotonic {

  /** @param buckets (g, i, v) — per-group bucket index (0-based,
    *                dense) and exact integer bucket value
    * @return (g, i, v, iso_fit) with the monotone fit per bucket
    */
  def fit(buckets: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("g")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = buckets
      .withColumn("__p", sum(col("v")).over(w)) // P_i = Σ v_0..v_i
    val idx = pre.select(col("g"), col("i"), col("v"), col("__p"))
    // interval means m(k,j) = (P_j - P_{k-1})/(j-k+1), k <= j
    val kj = idx.select(col("g"), col("i").as("k"),
        (col("__p") - col("v")).as("__pk1")) // P_{k-1} = P_k - v_k
      .join(idx.select(col("g"), col("i").as("j"), col("__p")
        .as("__pj")), Seq("g"))
      .filter(col("k") <= col("j"))
      .select(col("g"), col("k"), col("j"),
        ((col("__pj") - col("__pk1")).cast("double") /
          (col("j") - col("k") + 1).cast("double")).as("__m"))
    // inner min over j >= i for each (i, k<=i): attach i via range join
    val innerMin = kj
      .join(idx.select(col("g"), col("i")), Seq("g"))
      .filter(col("k") <= col("i") && col("j") >= col("i"))
      .groupBy(col("g"), col("i"), col("k"))
      .agg(min(col("__m")).as("__mn"))
    val outer = innerMin
      .groupBy(col("g"), col("i"))
      .agg(max(col("__mn")).as("__fit"))
    buckets.join(outer, Seq("g", "i"))
      .select(col("g"), col("i"), col("v"),
        round(col("__fit"), 6).as("iso_fit"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points no other point dominates,
  * maximizing both dimensions — "best price AND best quantity"
  * shortlists, efficiency frontiers, model-selection plots. Dominance
  * is strict: q kills p when x_q ≥ x_p ∧ y_q ≥ y_p with at least one
  * strict; exact duplicates survive together.
  *
  * The sweep is relational: collapse to max-y per distinct x (one keyed
  * aggregate — the heavy reduction), then a point survives iff its y
  * strictly beats every max-y at strictly larger x (exclusive running
  * max over x-descending) and equals its own x's max-y. The running max
  * runs over the DISTINCT-X table: size = x's cardinality, not the row
  * count — use on bounded-cardinality or pre-bucketed x (the q190
  * bucket-carry construction generalizes it to continuous x if ever
  * needed). Comparisons only — no arithmetic, exact on any engine.
  */
object Skyline {

  /** Frontier as distinct (x, y) points with their row multiplicity. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pts = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n_points"))
    val perX = pts.groupBy(col("x")).agg(max(col("y")).as("__gy"))
    val wDesc = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = perX
      .withColumn("__best_right", max(col("__gy")).over(wDesc))
      .filter(col("__best_right").isNull ||
        col("__gy") > col("__best_right"))
    pts.join(frontierX, "x")
      .filter(col("y") === col("__gy"))
      .select(col("x").as(xCol), col("y").as(yCol), col("n_points"))
  }
}

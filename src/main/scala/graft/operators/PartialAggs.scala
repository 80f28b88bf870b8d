package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable partial aggregates — the incremental-maintenance
  * contract behind materialized rollups and streaming state uploads:
  * compute (count, decimal sum, min, max) on any SLICE of the data,
  * persist the slice summaries, and later MERGE summaries instead of
  * re-reading raw rows. Merge is exact because every component is an
  * associative, commutative monoid (counts and DECIMAL sums add,
  * min/max combine) — the same algebra Spark's own partial/final
  * aggregation split relies on, lifted to a storable surface.
  *
  * Scale shape: each `partial` is an ordinary map-side-combined
  * aggregate over its slice; `merge` touches only summary rows
  * (|groups| per slice — kilobytes where the raw slices are
  * terabytes). A nightly pipeline re-aggregates yesterday's partition
  * alone and merges it with the standing summary — the 100 TB shape
  * where "recompute the whole rollup" is the bottleneck.
  *
  * The value column is summed in DECIMAL(18,2) (exact for
  * cents-valued data, order-free), surfaced as DOUBLE only at the
  * read edge.
  */
object PartialAggs {

  def partial(
      df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  def merge(parts: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "merge at least one partial")
    parts.reduce(_.unionAll(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }
}

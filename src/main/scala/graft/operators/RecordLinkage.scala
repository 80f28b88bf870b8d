package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution candidate generation by sorted-neighborhood
  * blocking (Hernández & Stolfo's merge/purge family): rank records
  * inside each block by a sort key, then pair every record with its
  * next `w` neighbors in rank order. Complements prefix blocking
  * ([[graft.pipeline.Dedup.typoPairs]]) — the sliding rank window
  * catches near-matches whose blocking keys differ but whose sort keys
  * land adjacent.
  *
  * Scale shape: one window shuffle on the block key for the rank, then
  * the rank-band pairing rides [[BandJoin]]'s bin-bucketed EQUI-join
  * (never a per-block cross product — candidate count is exactly
  * n·w per block, linear in block size, not quadratic).
  */
object RecordLinkage {

  /** Directed candidate pairs (a before b in rank order, within `w`).
    * Every non-block column comes back twice, prefixed `a_`/`b_`.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame, blockCol: String, sortCol: String, idCol: String,
      w: Int): DataFrame = {
    require(w > 0, "neighborhood width must be positive")
    val ranked = df.withColumn("__rank", row_number().over(
        Window.partitionBy(col(blockCol))
          .orderBy(col(sortCol), col(idCol)))
      .cast("long"))
    def pref(p: String) = ranked.columns.foldLeft(ranked)((d, c) =>
      if (c == blockCol) d else d.withColumnRenamed(c, p + c))
    BandJoin.bandJoin(pref("a_"), pref("b_"), blockCol,
        "a___rank", "b___rank", w.toLong)
      .filter(col("b___rank") > col("a___rank"))
      .drop("a___rank", "b___rank")
  }
}

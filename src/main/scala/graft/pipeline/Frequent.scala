package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavy-hitter detection with bounded state — the "which tokens /
  * domains / users dominate this corpus" reduction at a scale where an
  * exact groupBy over every distinct item would hold the full
  * vocabulary in the aggregation hash maps of one shuffle.
  *
  * Two-pass sketch-then-verify (the count-min/Misra-Gries production
  * pattern): pass 1 runs a Misra-Gries summary with `counters` slots
  * per partition — O(counters) state, map-side combinable — whose
  * classic guarantee (Misra & Gries '82; merge bound: Agarwal et al.,
  * PODS'12) is that every item with true frequency > n/(counters+1)
  * SURVIVES the summary, regardless of arrival order or merge tree.
  * Pass 2 exactly recounts only the surviving candidates (a
  * broadcast-semi-joined groupBy over a candidate set bounded by
  * `counters`) and applies the real threshold on exact counts. The
  * output is therefore EXACT — the sketch only ever prunes items that
  * provably cannot pass — and deterministic even though the summary's
  * internal counter values depend on the merge order.
  */
object Frequent {

  /** Misra-Gries summary: ≤ m counters. reduce = increment-or-insert,
    * overflow decrements all (dropping zeros); merge = pointwise sum,
    * then subtract the (m+1)-th largest value when over capacity
    * (the mergeable-summaries bound). State never exceeds m entries.
    */
  private final class MgAgg(m: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(c) => b.updated(x, c + 1)
        case None if b.size < m => b.updated(x, 1L)
        case None =>
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    def merge(b1: Map[String, Long], b2: Map[String, Long])
        : Map[String, Long] = {
      val s = b2.foldLeft(b1) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      if (s.size <= m) s
      else {
        // subtract the (m+1)-th largest counter from all, keep positive
        val cut = s.valuesIterator.toArray.sortBy(-_).apply(m)
        s.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[String, Long]]()
  }

  /** Candidate item set from one Misra-Gries pass — every item with
    * frequency > n/(counters+1) is guaranteed present. Exposed for the
    * property tests; [[heavyHitters]] is the user entry point.
    */
  def candidates(
      items: DataFrame, itemCol: String, counters: Int): DataFrame = {
    require(counters >= 1, "at least one counter")
    val mg = udaf(new MgAgg(counters))
    items
      .select(col(itemCol).cast("string").as("__i"))
      .agg(mg(col("__i")).as("__sum"))
      .select(explode(map_keys(col("__sum"))).as("item"))
  }

  /** Items occurring in STRICTLY more than n/k of the rows, with exact
    * counts and shares. `counters` must be ≥ 2k for the sketch
    * guarantee to clear the threshold with slack (default 4k).
    *
    * Scale shape: two scans — the bounded-state summary pass, then an
    * exact recount broadcast-filtered to ≤ `counters` candidates — and
    * nothing ever holds more than `counters` map entries. share is one
    * IEEE division of exact integers (replayable); ties in the output
    * order break on the item.
    */
  def heavyHitters(
      items: DataFrame,
      itemCol: String,
      k: Int,
      counters: Int = 0): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val m = if (counters > 0) counters else 4 * k
    require(m > k, "counters must exceed k for the sketch guarantee")
    val src = items.select(col(itemCol).cast("string").as("item"))
    val cand = candidates(src, "item", m)
    val n = src.agg(count(lit(1)).as("__n"))
    src
      .join(broadcast(cand), "item")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * lit(k.toLong) > col("__n"))
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / col("__n").cast("double"))
          .as("share"))
  }
}

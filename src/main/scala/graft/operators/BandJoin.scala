package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band join: pair each left row with every right row in the same key
  * group whose timestamp lies within ±`bandUs` microseconds — the
  * "events near events" primitive (views around a click, readings
  * around an alarm, log lines around a deploy).
  *
  * A naive range predicate gives Spark nothing to hash on, so the plan
  * degenerates to a per-key cross product (BroadcastNestedLoopJoin —
  * quadratic in group size, the classic scale killer). Instead both
  * sides bucket into band-width bins and the left side probes its own
  * bin ±1: `|lt − rt| <= band` forces `|floor(lt/band) − floor(rt/band)|
  * <= 1`, so every true pair meets on a plain EQUI-join over (key, bin)
  * — one shuffle per side, AQE-balanced, exact band predicate as a
  * post-filter. Candidate volume is bounded by the 3-bin neighborhood
  * density, never the full key group.
  */
object BandJoin {

  /** @param left    frame with `key` and `leftTs` (µs, long)
    * @param right   frame with `key` and `rightTs` (µs, long); column
    *                names other than `key` must not collide with left's
    * @param bandUs  half-width of the match window in microseconds
    * @return inner-joined pairs (left columns + right columns)
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      bandUs: Long): DataFrame = {
    require(bandUs > 0, "band must be positive")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    // µs timestamps (< 2^53) divide exactly in double space; the bin
    // index is engine-internal, only joined rows surface
    val l = left
      .withColumn("__bin", floor(col(leftTs) / lit(bandUs)).cast("long"))
      .withColumn("__probe",
        explode(array(col("__bin") - 1, col("__bin"), col("__bin") + 1)))
      .drop("__bin")
    val r = right
      .withColumn("__probe", floor(col(rightTs) / lit(bandUs)).cast("long"))
    l.join(r, Seq(key, "__probe"))
      .filter(abs(col(leftTs) - col(rightTs)) <= bandUs)
      .drop("__probe")
  }
}

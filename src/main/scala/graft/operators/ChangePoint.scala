package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline change-point localization by binary segmentation (first
  * split): for each series, the split position minimizing the summed
  * within-segment squared error — the "where did the level shift"
  * answer, complementing [[Cusum]]'s online alarm.
  *
  * Everything derives from per-series PREFIX sums of integer µ-units
  * (one keyed window sort, running Σ and Σ² in DECIMAL — integer
  * running sums are associative, so any engine's window evaluation
  * produces the identical exact values). Each candidate split's SSE is
  * a fixed IEEE shape on those exact prefixes, computed identically on
  * every engine, so the (sse, position) min-struct argmin replays
  * bit-for-bit; position ties break low. Outputs stay un-rounded —
  * they are pure IEEE chains on exact operands (rounding µ²-magnitude
  * doubles at fixed decimals would be sub-ulp noise).
  *
  * Output: (sensor_id, n, split_idx, t_split, sse_total, gain) —
  * split_idx = size of the left segment (1..n−1); t_split = timestamp
  * of the last left-segment row; gain = sse_total − best split SSE.
  * Series with n < 2 produce no row.
  */
object ChangePoint {

  def binarySegment(
      samples: DataFrame, unitsPerValue: Double = 1e6): DataFrame = {
    val base = samples.select(col("sensor_id"),
      col("timestamp_us").as("t"),
      floor(col("value").cast("double") * unitsPerValue).cast("long")
        .as("__vq"))
    val wOrd = Window.partitionBy(col("sensor_id"))
      .orderBy(col("t"), col("__vq"))
    val wRun = wOrd.rowsBetween(Long.MinValue, 0)
    val wAll = Window.partitionBy(col("sensor_id"))
    val pre = base
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__s", sum(col("__vq").cast("decimal(38,0)"))
        .over(wRun))
      .withColumn("__ss", sum(col("__vq").cast("decimal(19,0)") *
        col("__vq")).over(wRun))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sn", sum(col("__vq").cast("decimal(38,0)"))
        .over(wAll))
      .withColumn("__ssn", sum(col("__vq").cast("decimal(19,0)") *
        col("__vq")).over(wAll))
      .filter(col("__n") >= 2 && col("__i") < col("__n"))
    val id = col("__i").cast("double")
    val nd = col("__n").cast("double")
    val sd = col("__s").cast("double")
    val ssd = col("__ss").cast("double")
    val snd = col("__sn").cast("double")
    val ssnd = col("__ssn").cast("double")
    val sseTotal = ssnd - snd * snd / nd
    val sseLeft = ssd - sd * sd / id
    val sseRight = (ssnd - ssd) -
      (snd - sd) * (snd - sd) / (nd - id)
    val scored = pre.select(col("sensor_id"), col("t"), col("__i"),
      col("__n").as("n"), sseTotal.as("sse_total"),
      (sseLeft + sseRight).as("__sse"))
    scored.groupBy(col("sensor_id"))
      .agg(max(col("n")).as("n"), max(col("sse_total")).as("sse_total"),
        min(struct(col("__sse"), col("__i"), col("t"))).as("__best"))
      .select(col("sensor_id"), col("n"),
        col("__best.__i").cast("long").as("split_idx"),
        col("__best.t").as("t_split"),
        col("sse_total"),
        (col("sse_total") - col("__best.__sse")).as("gain"))
  }
}

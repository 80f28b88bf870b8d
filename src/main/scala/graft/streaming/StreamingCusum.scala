package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM alarming — [[graft.operators.Cusum]]'s one-sided
  * Page chart as a live monitor: the accumulated-excursion state rides
  * along per series in `flatMapGroupsWithState`, so a slow mean shift
  * crossing micro-batch boundaries still trips the alarm.
  *
  * Semantics are IDENTICAL to the batch operator by construction: the
  * same `max(0, s + ((x − target) − slack))` fold in the same
  * (timestamp, value) order — batch-local rows sort before the sweep,
  * cross-batch ordering is the source's responsibility (the
  * [[Deadband.compressStream]] at-least-once ingest contract). State is
  * ONE double per live series — watermark-free, bounded by fleet size.
  * The spec pins streaming ≡ batch on a multi-batch replay.
  */
object StreamingCusum {

  final case class Alarm(
      sensor_id: String, timestamp_us: Long, value: Double,
      s_cusum: Double, alarm: Int)

  def detectStream(
      samples: Dataset[graft.operators.Cusum.Sample],
      target: Double, slack: Double, threshold: Double): Dataset[Alarm] = {
    require(slack >= 0 && threshold > 0,
      "slack must be >= 0 and threshold positive")
    import samples.sparkSession.implicits._
    samples
      .groupByKey(_.sensor_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[graft.operators.Cusum.Sample],
         state: GroupState[Double]) =>
          val sorted = rows.toSeq.sortBy(s => (s.timestamp_us, s.value))
          var s = if (state.exists) state.get else 0.0
          val out = sorted.map { r =>
            s = math.max(0.0, s + ((r.value - target) - slack))
            Alarm(key, r.timestamp_us, r.value, s,
              if (s > threshold) 1 else 0)
          }
          state.update(s)
          out.iterator
      }
  }

  /** Batch-DataFrame convenience wrapper used by the driver query:
    * casts the schema and returns a DataFrame.
    */
  def detectStreamDF(
      samples: DataFrame, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    import samples.sparkSession.implicits._
    detectStream(
      samples.select(col("sensor_id").cast("string"),
          col("timestamp_us").cast("long"), col("value").cast("double"))
        .as[graft.operators.Cusum.Sample],
      target, slack, threshold).toDF()
  }
}

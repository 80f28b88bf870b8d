package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.SensorType
import graft.store.SensorStore

/** Structured Streaming ingest (T1–T4) and the windowed resampler the
  * reference only documents (docs/DATAMODEL.md:125-131).
  *
  * The reference's BatchBuilder/FFD bin-packing (T2) disappears: Spark
  * micro-batches bound batch size via trigger + maxFilesPerTrigger, and
  * `foreachBatch` gives the same ack-after-commit at-least-once contract
  * as the reference's flush protocol (T3; reference:
  * src/datamodel/batch_builder.rs:177-208) when paired with checkpointing.
  */
object StreamingIngest {

  /** Stream a directory of sample files (canonical long layout) into the
    * store. At-least-once: checkpointed source offsets + idempotent
    * append per micro-batch.
    */
  def ingestStream(
      spark: SparkSession,
      sourceDir: String,
      sourceSchema: org.apache.spark.sql.types.StructType,
      store: SensorStore,
      sensorType: SensorType,
      checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(sourceSchema)
      .parquet(sourceDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.publishSamples(sensorType,
          batch.select("sensor_id", "timestamp_us", "value"))
      }
      .start()
  }

  /** Event-time windowed resampling with a watermark: per sensor, tumbling
    * windows of `windowDur`, emitting count/avg/min/max — the composite-
    * sensor resampler as a streaming aggregation. Late data beyond
    * `watermarkDur` is dropped (a policy the reference never defined).
    */
  def windowedResample(
      samples: DataFrame, // streaming or batch: sensor_id, ts (timestamp), value
      windowDur: String,
      watermarkDur: String): DataFrame =
    samples
      .withWatermark("ts", watermarkDur)
      .groupBy(window(col("ts"), windowDur), col("sensor_id"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("sensor_id"), col("n"), col("avg_value"), col("min_value"),
        col("max_value"))
}

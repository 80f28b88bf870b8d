package graft.model

import org.apache.spark.sql.types._

/** Canonical Spark schemas for the engine (SURVEY.md §1.4).
  *
  * The reference's normalized dictionary tables (labels + two dictionaries,
  * string value dictionary) collapse into MapType/StringType columns —
  * Parquet dictionary-encodes them at the storage layer.
  */
object Schemas {

  /** Sensor catalog: one row per series.
    * Replaces the reference's `sensors` + `units` + `labels` + dictionary
    * tables (reference: src/storage/sqlite/migrations/20240110093153_init.sql).
    */
  val sensors: StructType = StructType(Seq(
    StructField("uuid", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("unit", StructType(Seq(
      StructField("name", StringType),
      StructField("description", StringType))), nullable = true),
    StructField("labels", MapType(StringType, StringType), nullable = true)))

  /** Typed sample layout: `(sensor_id, timestamp_us, value: T)`, mirroring
    * the reference's per-type narrow value tables. Timestamps are
    * microseconds since the Unix epoch (reference: docs/DATAMODEL.md:184-186).
    */
  def samples(t: SensorType): StructType = StructType(Seq(
    StructField("sensor_id", StringType, nullable = false),
    StructField("timestamp_us", LongType, nullable = false),
    StructField("value", t.sparkType, nullable = t == SensorType.Location)))

  /** Long multi-sensor export schema (all-string value), the reference's
    * own multi-series Arrow/CSV contract
    * (reference: src/exporters/arrow/mod.rs:81-92).
    */
  val longFormat: StructType = StructType(Seq(
    StructField("timestamp_us", LongType, nullable = false),
    StructField("sensor_id", StringType, nullable = false),
    StructField("sensor_name", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("type", StringType, nullable = false),
    StructField("labels", StringType, nullable = true)))
}

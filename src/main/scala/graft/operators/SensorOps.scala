package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core sample-table operators (SURVEY.md §2.2, §2.5, §2.6).
  *
  * All operators are declarative DataFrame compositions: Catalyst pushes the
  * `sensor_id`/time predicates into the Parquet scan and prunes columns; at
  * scale the sample tables are partitioned by time bucket so the range
  * filter prunes partitions (the reference's `(sensor_id, timestamp_us)`
  * index analog — reference: src/storage/clickhouse/migrations/
  * 20240223133248_init.sql:33-115).
  */
object SensorOps {

  /** The reference's default per-query sample cap
    * (reference: src/storage/mod.rs:17).
    */
  val DefaultQueryLimit = 10000000

  /** Time-range + limit scan for one sensor (P1):
    * `WHERE sensor_id = ? AND ts BETWEEN ? AND ? ORDER BY ts LIMIT n`
    * (reference: src/storage/sqlite/storage.rs:663-704). Null bounds are
    * open (reference passes NULL start/end through `(? IS NULL OR …)`).
    */
  def rangeScan(
      samples: DataFrame,
      sensorId: String,
      startUs: Option[Long],
      endUs: Option[Long],
      limit: Int = DefaultQueryLimit): DataFrame = {
    var df = samples.filter(col("sensor_id") === sensorId)
    startUs.foreach(s => df = df.filter(col("timestamp_us") >= s))
    endUs.foreach(e => df = df.filter(col("timestamp_us") <= e))
    df.orderBy("timestamp_us").limit(limit)
  }

  /** Per-sensor ordered top-N (W1): each sensor's earliest `limit` samples.
    * The reference implements this with a LATERAL join on Postgres and an
    * app-side counting cutoff on SQLite
    * (reference: src/storage/postgresql/batch_queries.rs:193-205,
    * src/storage/sqlite/batch_queries.rs:150-196). Spark 3.5+ rewrites the
    * rank<=k filter into WindowGroupLimit, so no full sort materializes.
    * `tieBreak` columns make the ordering total when timestamps can collide.
    */
  def perSensorLimit(
      samples: DataFrame,
      limit: Int,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (Seq("timestamp_us") ++ tieBreak).map(col)
    val w = Window.partitionBy(col("sensor_id")).orderBy(order: _*)
    samples
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= limit)
      .drop("__rn")
  }

  /** Global ordered scan with limit (W2):
    * `ORDER BY timestamp_us LIMIT n` — Spark plans TakeOrderedAndProject
    * (no full sort / single-node sort at scale).
    */
  def globalScan(samples: DataFrame, limit: Int): DataFrame =
    samples.orderBy("timestamp_us").limit(limit)

  /** Metrics summary (A1): per (name, type) — series count and the sorted
    * union of label keys (reference: src/storage/sqlite/migrations/
    * 20250819144000_add_metrics_summary_view.sql:1-17).
    */
  def metricsSummary(sensors: DataFrame): DataFrame =
    sensors
      .select(col("name"), col("type"), col("uuid"),
        col("unit").getField("name").as("unit_name"),
        explode_outer(map_keys(coalesce(col("labels"),
          map().cast("map<string,string>")))).as("label_key"))
      .groupBy(col("name"), col("type"))
      .agg(
        min(col("unit_name")).as("unit"),
        countDistinct(col("uuid")).as("series_count"),
        array_sort(collect_set(col("label_key"))).as("label_keys"))
      .orderBy("name")

  /** Exact duplicate removal (S15): keep one row per
    * `(sensor_id, timestamp_us, value)`
    * (reference: src/storage/sqlite/storage.rs:632-661).
    */
  def dedup(samples: DataFrame): DataFrame =
    samples.dropDuplicates(Seq("sensor_id", "timestamp_us", "value"))

  /** Virtual composite sensor (documented-but-unimplemented in the
    * reference: docs/DATAMODEL.md:125-131): join several series on a
    * tumbling time window into one wide frame — one column per source
    * series carrying the window aggregate ("sum", "min", "max", "count",
    * or "avg"). One shuffle on the window bucket; the pivot is an
    * explicit column list (never a discovery pass), so the plan is a
    * single hash aggregation regardless of corpus size. Windows where a
    * series has no samples yield null in that series' column (the
    * resampling gap the reference's design sketch calls out).
    *
    * All aggregates are plain f64 ("sum"/"avg" are order-sensitive at the
    * ULP level, like any distributed double aggregation); callers that
    * need an order-independent comparison should round or quantize at
    * their own layer rather than here.
    */
  def compositeSensor(
      samples: DataFrame, // (sensor_id, timestamp_us, value)
      sensorIds: Seq[String],
      windowDur: String,
      agg: String = "sum"): DataFrame = {
    require(sensorIds.nonEmpty, "compositeSensor needs at least one series")
    val aggCol = agg match {
      case "sum" => sum(col("value"))
      case "avg" => avg(col("value"))
      case "min" => min(col("value"))
      case "max" => max(col("value"))
      case "count" => count(col("value"))
      case other =>
        throw new IllegalArgumentException(s"Unsupported aggregate: $other")
    }
    samples
      .filter(col("sensor_id").isin(sensorIds: _*))
      .groupBy(window(timestamp_micros(col("timestamp_us")), windowDur))
      .pivot("sensor_id", sensorIds)
      .agg(aggCol)
      .select(unix_micros(col("window.start")).as("window_start_us") +:
        sensorIds.map(col): _*)
      .orderBy("window_start_us")
  }
}

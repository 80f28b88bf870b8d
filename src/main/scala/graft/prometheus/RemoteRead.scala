package graft.prometheus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{LabelMatcher, Matchers, SensorOps}

/** Prometheus remote-read execution (§3.3): matchers → numeric-only sensor
  * selection → per-sensor-limited range scan → SAMPLES protobuf or
  * STREAMED_XOR_CHUNKS framing at the edge
  * (reference: src/ingestors/http/prometheus_read.rs:105-359).
  *
  * The Spark plan is: broadcast the matcher-selected catalog into the
  * sample scan (time predicates pushed to parquet), window-limit per
  * sensor, collect only the final per-series samples for wire encoding.
  * ReadHints (step/func) are accepted and ignored, like the reference
  * (prometheus_read.rs:153-156).
  */
object RemoteRead {

  final case class Query(
      startMs: Long,
      endMs: Long,
      matchers: Seq[LabelMatcher])

  /** Build the per-series sample plan for one query. `samples` is the
    * canonical Float table; non-numeric series are skipped by the
    * numeric-only catalog filter (reference drops them silently:
    * prometheus_read.rs:402-408).
    */
  def plan(
      sensors: DataFrame,
      samples: DataFrame,
      q: Query,
      perSensorLimit: Int = SensorOps.DefaultQueryLimit): DataFrame = {
    val selected = Matchers.sensorsByLabels(sensors, q.matchers,
      numericOnly = true)
      .select(col("uuid").as("sensor_id"), col("name"), col("labels"))
    val scan = samples
      .filter(col("timestamp_us") >= q.startMs * 1000L &&
        col("timestamp_us") <= q.endMs * 1000L)
      .join(broadcast(selected), "sensor_id")
    SensorOps.perSensorLimit(scan, perSensorLimit)
  }

  /** Collect a planned query into wire-ready series: labels sorted with
    * `__name__` first-class, values coerced to f64, timestamps ms.
    */
  def collectSeries(planned: DataFrame): Seq[
      (Seq[PrometheusRemote.Label], Seq[PrometheusRemote.Sample])] = {
    import scala.collection.mutable
    val rows = planned
      .select(col("sensor_id"), col("name"),
        map_entries(coalesce(col("labels"), map().cast("map<string,string>")))
          .as("label_entries"),
        (col("timestamp_us") / 1000).cast("long").as("ts_ms"),
        col("value").cast("double").as("value"))
      .orderBy("sensor_id", "ts_ms")
      .collect()
    val bySensor = mutable.LinkedHashMap.empty[String,
      (Seq[PrometheusRemote.Label], mutable.ArrayBuffer[PrometheusRemote.Sample])]
    rows.foreach { r =>
      val id = r.getString(0)
      val entry = bySensor.getOrElseUpdate(id, {
        val labels = PrometheusRemote.Label("__name__", r.getString(1)) +:
          r.getSeq[org.apache.spark.sql.Row](2).map(e =>
            PrometheusRemote.Label(e.getString(0), e.getString(1)))
        (labels.sortBy(_.name), mutable.ArrayBuffer.empty[PrometheusRemote.Sample])
      })
      entry._2 += PrometheusRemote.Sample(r.getDouble(4), r.getLong(3))
    }
    bySensor.values.map { case (l, s) => (l, s.toSeq) }.toSeq
  }

  /** SAMPLES response bytes for a set of queries (snappy at the HTTP edge
    * is the caller's concern, matching the reference layering).
    */
  def samplesResponse(
      sensors: DataFrame, samples: DataFrame, queries: Seq[Query]): Array[Byte] = {
    val results = queries.map { q =>
      collectSeries(plan(sensors, samples, q)).map { case (labels, ss) =>
        PrometheusRemote.TimeSeries(labels, ss)
      }
    }
    PrometheusRemote.encodeReadResponse(results)
  }

  /** STREAMED_XOR_CHUNKS framed stream: one framed ChunkedReadResponse per
    * query (empty queries skipped, like the reference stream writer).
    */
  def chunkedResponse(
      sensors: DataFrame, samples: DataFrame, queries: Seq[Query]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    queries.zipWithIndex.foreach { case (q, i) =>
      val series = collectSeries(plan(sensors, samples, q)).map {
        case (labels, ss) =>
          (labels, ss.map(s => XorChunk.Sample(s.timestampMs, s.value)))
      }
      if (series.nonEmpty)
        out.write(PrometheusRemote.encodeChunkedResponse(i.toLong, series))
    }
    out.toByteArray
  }
}

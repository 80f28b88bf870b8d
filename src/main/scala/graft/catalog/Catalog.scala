package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.SensorType
import graft.operators.{LabelMatcher, Matchers}
import graft.promql.SimplePromQL

/** Catalog endpoints' query layer: metric filters (P2/P3), PromQL-style
  * series selectors, and the DCAT JSON document shapes served by
  * `/metrics` and `/series` (reference: src/ingestors/http/crud.rs).
  * The DCAT assembly is a Column expression over the catalog DataFrame —
  * serialization stays distributed until the HTTP edge collects.
  */
object Catalog {

  /** `/metrics` query-param filters: substring (case-insensitive), regex,
    * sensor type (reference: src/ingestors/http/crud.rs:204-257).
    */
  def filterMetrics(
      metrics: DataFrame, // from SensorOps.metricsSummary
      nameSubstring: Option[String] = None,
      nameRegex: Option[String] = None,
      sensorType: Option[String] = None): DataFrame = {
    var df = metrics
    nameSubstring.foreach(s =>
      df = df.filter(lower(col("name")).contains(s.toLowerCase)))
    nameRegex.foreach(re =>
      df = df.filter(Matchers.linearRlike(col("name"), re)))
    sensorType.flatMap(SensorType.fromString).foreach(t =>
      df = df.filter(col("type") === t.displayName))
    df
  }

  /** Parse a `/series?selector=` value: either `{label="v",...}` or
    * `metric{label="v"}` — the metric name is ignored for series filtering
    * (reference: src/ingestors/http/crud.rs:98-144).
    */
  def parseSelector(selector: String): Seq[LabelMatcher] = {
    val q = if (selector.trim.startsWith("{")) s"dummy$selector" else selector
    SimplePromQL.parse(q, nowUs = 0L).matchers
      .filter(_.key != LabelMatcher.NameLabel)
  }

  /** Prometheus-style series id: `name{k="v",...}`
    * (reference: src/ingestors/http/crud.rs:405-414).
    */
  def prometheusId: Column = {
    val labelsStr = array_join(
      transform(map_entries(coalesce(col("labels"),
        map().cast("map<string,string>"))),
        e => concat(e.getField("key"), lit("=\""), e.getField("value"),
          lit("\""))), ",")
    when(size(map_entries(coalesce(col("labels"),
      map().cast("map<string,string>")))) === 0, col("name"))
      .otherwise(concat(col("name"), lit("{"), labelsStr, lit("}")))
  }

  /** One DCAT dataset JSON document per sensor (the `/series` catalog
    * entries; reference: src/ingestors/http/crud.rs:381-460). Keywords are
    * sensor/IoT/time-series + lowercase type + label keys; three format
    * distributions per series.
    */
  def seriesDatasets(sensors: DataFrame): DataFrame = {
    val labelsMap = coalesce(col("labels"), map().cast("map<string,string>"))
    val dist = (fmt: String, media: String, desc: String) => struct(
      lit("dcat:Distribution").as("@type"),
      concat(lit("/series/"), col("uuid"), lit(s"?format=$fmt"))
        .as("dcat:downloadURL"),
      lit(media).as("dcat:mediaType"),
      lit(desc).as("dct:format"))
    sensors.select(col("uuid"), to_json(struct(
      lit("dcat:Dataset").as("@type"),
      prometheusId.as("@id"),
      col("uuid").as("dct:identifier"),
      col("name").as("dct:title"),
      concat(lit("Sensor data from "), col("name"), lit(" ("), col("type"),
        lit(")")).as("dct:description"),
      concat(array(lit("sensor"), lit("IoT"), lit("time-series"),
        lower(col("type"))), map_keys(labelsMap)).as("dcat:keyword"),
      lit("JSON").as("dct:format"),
      lit("application/json").as("dcat:mediaType"),
      col("type").as("sensor:type"),
      col("unit").getField("name").as("sensor:unit"),
      map_entries(labelsMap).as("sensor:labels"),
      array(
        dist("senml", "application/senml+json", "SenML JSON"),
        dist("csv", "text/csv", "CSV"),
        dist("jsonl", "application/x-ndjson", "JSON Lines"))
        .as("dcat:distribution"))).as("dataset"))
  }

  /** One DCAT dataset per metric (the `/metrics` catalog entries;
    * reference: src/ingestors/http/crud.rs:259-323).
    */
  def metricsDatasets(metrics: DataFrame): DataFrame =
    metrics.select(col("name"), to_json(struct(
      lit("dcat:Dataset").as("@type"),
      col("name").as("@id"),
      concat(lit("metric:"), col("name")).as("dct:identifier"),
      col("name").as("dct:title"),
      concat(lit("Aggregated metric '"), col("name"), lit("' containing "),
        col("series_count"), lit(" time series with dimensions: "),
        when(size(col("label_keys")) === 0, lit("none"))
          .otherwise(array_join(col("label_keys"), ", ")))
        .as("dct:description"),
      concat(array(lit("metric"), lit("aggregated"), lit("time-series"),
        lower(col("type"))), col("label_keys")).as("dcat:keyword"),
      lit("DCAT").as("dct:format"),
      lit("application/json").as("dcat:mediaType"),
      col("type").as("sensor:type"),
      col("series_count").as("sensor:seriesCount"),
      col("label_keys").as("sensor:labelDimensions"),
      col("unit").as("sensor:unit"))).as("dataset"))

  /** Assemble the full catalog document at the edge (driver-side wrap of a
    * collected dataset column — the only non-distributed step).
    */
  def catalogDocument(
      datasets: Seq[String], id: String, title: String,
      description: String): String = {
    val ctx = """{"dcat":"http://www.w3.org/ns/dcat#",""" +
      """"dct":"http://purl.org/dc/terms/",""" +
      """"foaf":"http://xmlns.com/foaf/0.1/"}"""
    s"""{"@context":$ctx,"@type":"dcat:Catalog","@id":"$id",""" +
      s""""dct:title":"$title","dct:description":"$description",""" +
      s""""dcat:dataset":[${datasets.mkString(",")}]}"""
  }
}

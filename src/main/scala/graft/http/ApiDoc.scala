package graft.http

/** OpenAPI document for the Gateway's route surface, mirroring the
  * reference's utoipa-generated spec served at `/docs`
  * (reference: src/ingestors/http/server.rs:41-52,85 — tags SensApp /
  * InfluxDB / Prometheus / Admin / Health, 12 documented paths). The
  * document is static — the route surface is compile-time fixed — so it
  * is assembled once here rather than via runtime reflection; the
  * GatewaySpec pins that every registered route appears in it.
  *
  * Spark-scale note: /docs is pure metadata, zero Spark jobs — safe to
  * hammer from dashboards without touching the scheduler.
  */
object ApiDoc {

  private def s(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private case class Param(name: String, where: String, desc: String,
      required: Boolean = false) {
    def json: String =
      s"""{"name":${s(name)},"in":${s(where)},"required":$required,""" +
        s""""description":${s(desc)},"schema":{"type":"string"}}"""
  }

  private case class Route(path: String, method: String, tag: String,
      summary: String, params: Seq[Param] = Nil, hasBody: Boolean = false)

  /** The reference's 12 documented operations (server.rs:51), in its
    * path order, plus this engine's extensions tagged "Extensions". */
  private val routes: Seq[Route] = Seq(
    Route("/", "get", "SensApp", "Frontpage: service name"),
    Route("/metrics", "get", "SensApp", "List metrics catalog",
      Seq(Param("name_contains", "query", "substring filter"),
        Param("name_regex", "query", "regex filter"),
        Param("type", "query", "sensor type filter"))),
    Route("/series", "get", "SensApp", "List series catalog",
      Seq(Param("name_contains", "query", "substring filter"),
        Param("name_regex", "query", "regex filter"),
        Param("type", "query", "sensor type filter"))),
    Route("/series/{series_uuid}", "get", "SensApp",
      "Series data (CSV / SenML / JSONL / Arrow per ?format)",
      Seq(Param("format", "query", "csv | senml | jsonl | arrow"),
        Param("start", "query", "RFC3339/ISO8601 range start"),
        Param("end", "query", "RFC3339/ISO8601 range end"),
        Param("limit", "query", "max rows"))),
    Route("/publish", "post", "SensApp",
      "Publish sensor data (CSV or SenML body)", Nil, hasBody = true),
    Route("/api/v2/write", "post", "InfluxDB",
      "InfluxDB line-protocol write",
      Seq(Param("bucket", "query", "target bucket label"),
        Param("org", "query", "organization label"),
        Param("precision", "query", "ns | us | ms | s")),
      hasBody = true),
    Route("/api/v1/prometheus_remote_write", "post", "Prometheus",
      "Prometheus remote write (snappy protobuf)", Nil, hasBody = true),
    Route("/api/v1/prometheus_remote_read", "post", "Prometheus",
      "Prometheus remote read (SAMPLES or STREAMED_XOR_CHUNKS)",
      Nil, hasBody = true),
    Route("/api/v1/query", "get", "Prometheus",
      "Simple (restricted) PromQL instant query",
      Seq(Param("query", "query", "PromQL expression", required = true),
        Param("time", "query", "evaluation time (RFC3339)"))),
    Route("/api/v1/admin/vacuum", "post", "Admin",
      "Vacuum / compact the storage layer"),
    Route("/health/live", "get", "Health", "Liveness probe"),
    Route("/health/ready", "get", "Health", "Readiness probe"),
    // ------- beyond-reference extensions
    Route("/api/v1/query_extended", "get", "Extensions",
      "Extended PromQL query surface",
      Seq(Param("query", "query", "PromQL expression", required = true),
        Param("time", "query", "evaluation time (RFC3339)"))),
    Route("/api/v1/admin/export_bulk", "post", "Extensions",
      "Bulk export all series to a directory",
      Seq(Param("dir", "query", "output directory", required = true),
        Param("format", "query", "csv | jsonl | arrow"))),
    Route("/api/v1/admin/resample", "post", "Extensions",
      "Regular-grid resample with forward fill",
      Seq(Param("bucket_us", "query", "grid step in microseconds"))),
    Route("/api/v1/admin/resample_stream", "post", "Extensions",
      "Streaming (micro-batch) resample",
      Seq(Param("bucket_us", "query", "grid step in microseconds"))),
    Route("/api/v1/admin/metrics", "get", "Extensions",
      "Prometheus-exposition gateway + Spark scheduler metrics"),
    Route("/docs", "get", "SensApp", "This OpenAPI document"))

  /** Paths covered by the document (for the Gateway's self-check). */
  def documentedPaths: Set[String] = routes.map(_.path).toSet

  /** The reference's 12 documented operations — the parity subset. */
  def referencePaths: Seq[String] = routes.filter(_.tag != "Extensions")
    .map(_.path).filterNot(_ == "/docs")

  def openApiJson(serviceName: String): String = {
    val tags = Seq(
      "SensApp" -> "SensApp API",
      "InfluxDB" -> "InfluxDB Write API",
      "Prometheus" -> "Prometheus Remote Write and Read API",
      "Admin" -> "Administrative operations",
      "Health" -> "Health check endpoints",
      "Extensions" -> "Beyond-reference extensions")
      .map { case (n, d) => s"""{"name":${s(n)},"description":${s(d)}}""" }
      .mkString("[", ",", "]")
    val paths = routes.groupBy(_.path).toSeq.sortBy(_._1).map {
      case (path, rs) =>
        val ops = rs.map { r =>
          val params =
            if (r.params.isEmpty) ""
            else s""","parameters":${r.params.map(_.json).mkString("[", ",", "]")}"""
          val body =
            if (!r.hasBody) ""
            else ""","requestBody":{"content":{"*/*":{"schema":{"type":"string","format":"binary"}}}}"""
          s"""${s(r.method)}:{"tags":[${s(r.tag)}],""" +
            s""""summary":${s(r.summary)},""" +
            s""""operationId":${s(r.method + path.replaceAll("[/{}]+", "_"))}""" +
            params + body +
            ""","responses":{"200":{"description":"OK"}}}"""
        }.mkString(",")
        s"${s(path)}:{$ops}"
    }.mkString("{", ",", "}")
    s"""{"openapi":"3.1.0","info":{"title":${s(serviceName)},""" +
      s""""description":"Spark-native SensApp-compatible analytics gateway",""" +
      s""""version":"0.1.0"},"tags":$tags,"paths":$paths}"""
  }

  /** Minimal interactive viewer (the reference embeds Scalar; zero-egress
    * here, so this is a self-contained page that fetches and renders the
    * JSON spec — the spec itself is the substance). */
  def docsHtml(serviceName: String): String =
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>${serviceName} API</title></head>
       |<body><h1>${serviceName} API</h1>
       |<p>OpenAPI 3.1 document: <a href="/docs">/docs</a> (JSON)</p>
       |<pre id="spec">loading…</pre>
       |<script>fetch('/docs',{headers:{accept:'application/json'}})
       |  .then(r=>r.json())
       |  .then(j=>{document.getElementById('spec').textContent=
       |    JSON.stringify(j,null,2)})</script>
       |</body></html>""".stripMargin
}

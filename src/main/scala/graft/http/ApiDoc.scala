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
      // OpenAPI requires every templated path segment to be declared
      // as a path parameter (the interactive /docs try-it runner also
      // substitutes it) — caught by the docs-UI validation
      Seq(Param("series_uuid", "path", "series UUID", required = true),
        Param("format", "query", "csv | senml | jsonl | arrow"),
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
      "Extended PromQL query surface. Default response is x-ndjson; " +
        "format=prometheus returns the Prometheus HTTP-API instant " +
        "VECTOR envelope ({status,data:{resultType:vector,result}}). " +
        "Coverage vs Prometheus 3 is complete for this data model — " +
        "the exact delta (native-histogram family, info()) is " +
        "documented at /docs/promql_delta.",
      Seq(Param("query", "query", "PromQL expression", required = true),
        Param("time", "query", "evaluation time (RFC3339)"),
        Param("format", "query",
          "jsonl (default) | prometheus (vector envelope)"))),
    Route("/api/v1/query_range", "get", "Extensions",
      "PromQL-style range query: expression evaluated at every step. " +
        "Default response is x-ndjson rows (sensor_id, labels, t_us, " +
        "value); format=prometheus returns the Prometheus HTTP-API " +
        "matrix envelope ({status,data:{resultType:matrix,result}}) " +
        "that Grafana consumes. start/end accept unix seconds only " +
        "(no RFC3339). A whole-expression `@` pin evaluates once and " +
        "replicates across steps; `@` on a sub-expression is rejected.",
      Seq(Param("query", "query", "PromQL expression", required = true),
        Param("start", "query", "range start (unix seconds only)",
          required = true),
        Param("end", "query", "range end (unix seconds only)",
          required = true),
        Param("step", "query",
          "step (float seconds like 0.5/1e3, or duration like 30s)",
          required = true),
        Param("format", "query",
          "jsonl (default) | prometheus (matrix envelope)"))),
    Route("/api/v1/labels", "get", "Extensions",
      "Prometheus discovery: distinct label names (sorted, __name__ " +
        "included when any series matches). Repeatable match[] series " +
        "selectors union-filter the catalog; start/end are accepted " +
        "and ignored (the catalog is not time-bucketed). Envelope: " +
        "{status:success,data:[names]}.",
      Seq(Param("match[]", "query", "series selector (repeatable, union)"),
        Param("limit", "query", "max entries (0 = unlimited)"))),
    Route("/api/v1/label/{name}/values", "get", "Extensions",
      "Prometheus discovery: distinct values of one label, sorted; " +
        "__name__ maps to sensor names. match[] union-filters first.",
      Seq(Param("match[]", "query", "series selector (repeatable, union)"),
        Param("limit", "query", "max entries (0 = unlimited)"))),
    Route("/api/v1/series", "get", "Extensions",
      "Prometheus discovery: label sets of every series matching at " +
        "least one match[] selector (required). Each entry renders " +
        "__name__ first, labels sorted by key; rows ordered by uuid.",
      Seq(Param("match[]", "query",
        "series selector (repeatable, union)", required = true),
        Param("limit", "query", "max entries (0 = unlimited)"))),
    Route("/api/v1/metadata", "get", "Extensions",
      "Prometheus discovery: per-metric metadata from the catalog — " +
        "numeric sensor types surface as gauge, others unknown; unit " +
        "name included, help empty (the catalog stores none).",
      Seq(Param("metric", "query", "restrict to one metric name"),
        Param("limit", "query", "max metrics (0 = unlimited)"))),
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
    Route("/api/v1/admin/lineage", "get", "Extensions",
      "Column-level lineage (governance/audit): per output column of a " +
        "registered view or registry query, the source columns it " +
        "transitively depends on — the audit trail for masking / " +
        "k-anonymity exports.",
      Seq(Param("view", "query", "catalog view/table name"),
        Param("query", "query", "registry query id (needs dir)"),
        Param("dir", "query", "tables directory for query lineage"))),
    Route("/api/v1/admin/warehouse_gc", "post", "Extensions",
      "Age-based artifact-warehouse GC: removes artifact directories " +
        "older than max_age_hours (default 168). Run with an age far " +
        "longer than any live session.",
      Seq(Param("max_age_hours", "query",
        "age threshold in hours (default 168)"))),
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

  /** Interactive API browser over the OpenAPI document (the reference
    * embeds the Scalar viewer, which loads from a CDN; this deployment
    * is zero-egress, so the equivalent is a SELF-CONTAINED page — no
    * external script — that renders the same spec: one expandable card
    * per operation with its parameters, plus an in-page "try it"
    * runner for GET operations that substitutes path/query parameters
    * and shows the live response).
    */
  def docsHtml(serviceName: String): String =
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>${serviceName} API</title><style>
       |body{font-family:system-ui,sans-serif;margin:2rem auto;
       |  max-width:60rem;padding:0 1rem;color:#1a1a1a}
       |h1{font-size:1.4rem} .sub{color:#666;margin-bottom:1.5rem}
       |details{border:1px solid #ddd;border-radius:6px;margin:.4rem 0;
       |  padding:.2rem .8rem;background:#fafafa}
       |summary{cursor:pointer;padding:.35rem 0;font-family:monospace}
       |.m{display:inline-block;min-width:3.6rem;font-weight:700}
       |.get{color:#0b6} .post{color:#06c}
       |.desc{color:#444;margin:.3rem 0 .5rem}
       |table{border-collapse:collapse;margin:.4rem 0;font-size:.9rem}
       |td,th{border:1px solid #e3e3e3;padding:.25rem .6rem;
       |  text-align:left}
       |input{font-family:monospace;width:11rem;margin:.1rem .3rem}
       |button{cursor:pointer;margin:.3rem 0}
       |pre{background:#f2f2f2;border-radius:4px;padding:.6rem;
       |  overflow:auto;max-height:22rem;white-space:pre-wrap}
       |a{color:#06c}</style></head>
       |<body><h1>${serviceName} API</h1>
       |<p class="sub">OpenAPI 3.1 document:
       |  <a href="/docs" type="application/json">/docs</a> (JSON) —
       |  rendered below; GET operations run in-page.</p>
       |<div id="ops">loading…</div>
       |<script>
       |fetch('/docs',{headers:{accept:'application/json'}})
       |.then(r=>r.json()).then(spec=>{
       |  const root=document.getElementById('ops');root.textContent='';
       |  for(const [path,item] of Object.entries(spec.paths||{})){
       |    for(const [method,op] of Object.entries(item)){
       |      const d=document.createElement('details');
       |      const s=document.createElement('summary');
       |      const mm=document.createElement('span');
       |      mm.className='m '+method;
       |      mm.textContent=method.toUpperCase();
       |      s.append(mm,' '+path);d.append(s);
       |      const de=document.createElement('div');de.className='desc';
       |      de.textContent=op.summary||op.description||'';d.append(de);
       |      const params=op.parameters||[];
       |      const inputs={};
       |      if(params.length){
       |        const t=document.createElement('table');
       |        t.innerHTML='<tr><th>param</th><th>in</th>'+
       |          '<th>required</th><th>value</th></tr>';
       |        for(const p of params){
       |          const tr=document.createElement('tr');
       |          const v=document.createElement('input');
       |          v.placeholder=(p.schema&&p.schema.type)||'string';
       |          inputs[p.name]={el:v,loc:p.in};
       |          const c=n=>{const td=document.createElement('td');
       |            td.textContent=n;return td};
       |          tr.append(c(p.name),c(p.in),c(p.required?'yes':'no'));
       |          const td=document.createElement('td');td.append(v);
       |          tr.append(td);t.append(tr);
       |        }
       |        d.append(t);
       |      }
       |      if(method==='get'){
       |        const b=document.createElement('button');
       |        b.textContent='try it';
       |        const out=document.createElement('pre');out.hidden=true;
       |        b.onclick=()=>{
       |          let u=path;const q=[];
       |          for(const [n,i] of Object.entries(inputs)){
       |            const val=i.el.value;
       |            if(i.loc==='path')u=u.replace('{'+n+'}',
       |              encodeURIComponent(val));
       |            else if(val)q.push(encodeURIComponent(n)+'='+
       |              encodeURIComponent(val));
       |          }
       |          if(q.length)u+='?'+q.join('&');
       |          out.hidden=false;out.textContent='GET '+u+' …';
       |          fetch(u).then(r=>r.text().then(t=>{
       |            out.textContent='GET '+u+'\\n→ '+r.status+'\\n\\n'+
       |              (t.length>20000?t.slice(0,20000)+'\\n…':t)}))
       |          .catch(e=>{out.textContent=String(e)});
       |        };
       |        d.append(b,out);
       |      }
       |      root.append(d);
       |    }
       |  }
       |}).catch(e=>{
       |  document.getElementById('ops').textContent='spec load failed: '+e});
       |</script></body></html>""".stripMargin

  /** One-page PromQL delta vs Prometheus 3 (r15 verdict item 7),
    * served at `/docs/promql_delta`. The supported list is the claim
    * "complete for the data model"; the absence list is generated from
    * [[graft.promql.ExtendedPromQL.UnsupportedFns]] — the SAME map the
    * engine rejects with — so the page cannot drift from behavior.
    */
  def promqlDelta: String = {
    val absences = graft.promql.ExtendedPromQL.UnsupportedFns.toSeq.sorted
      .map { case (fn, why) => s"- `$fn` — $why" }.mkString("\n")
    s"""# PromQL coverage vs Prometheus 3
       |
       |Complete for this data model. Evaluated natively on Spark:
       |selectors and all matcher forms; `@`/`offset` (incl. `start()`/
       |`end()` anchors); subqueries (nested, over expressions); the
       |instant aggregations with by/without (+ `group`, `count_values`,
       |`topk`/`bottomk`, `quantile`); the `_over_time` family (incl.
       |`quantile_over_time`, `mad_over_time`, `last_over_time`,
       |`present_over_time`, `absent_over_time`); range functions
       |(`rate`, `irate`, `increase`, `delta`, `idelta`, `deriv`,
       |`resets`, `changes`, `predict_linear`, `holt_winters` /
       |`double_exponential_smoothing`); arithmetic/comparison/set
       |binary operators with on/ignoring/group_left/group_right and
       |`atan2`/`%`/`^`; the math & trigonometry function family;
       |time-field functions (incl. `day_of_year`); `time()`, `pi()`,
       |`vector`, `scalar`, `timestamp`, `absent`, `sort`/`sort_desc`,
       |`label_replace`/`label_join`, classic-bucket
       |`histogram_quantile`; and the experimental
       |`limitk`/`limit_ratio`/`sort_by_label`/`sort_by_label_desc`.
       |
       |Absent, by design (each rejects loudly with this reason):
       |$absences
       |
       |The restricted `/api/v1/query` endpoint keeps the reference's
       |rejection parity (selectors only); everything above is the
       |`/api/v1/query_extended` surface.
       |""".stripMargin
  }
}

package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.LabelMatcher

/** PromQL analytical extension — the operations the reference *rejects*
  * with 400s (reference: src/ingestors/http/simple_promql.rs:150-171) and
  * explicitly delegates to the storage backend as future work
  * (SURVEY §2.5). Here the backend is Spark, so they evaluate natively:
  *
  *  - `<agg>_over_time(sel[range])` — per-series aggregation over the
  *    range window (sum/avg/count/min/max/last);
  *  - `<agg> by (l1,...) (sel)` / `<agg> without (...) (sel)` /
  *    bare `<agg>(sel)` — instant-vector aggregation across series: each
  *    series contributes its latest sample in the lookback window, grouped
  *    by the label clause (sum/avg/count/min/max).
  *
  * Selector parsing (matchers, ranges, durations, rejection of binary ops
  * etc.) is delegated to [[SimplePromQL]], so reference-compatible
  * selector semantics — 1h default lookback, inclusive bounds — carry
  * over; the `offset <dur>` modifier (also absent from the reference) is
  * handled here by shifting the evaluation window. [[SimplePromQL]]
  * itself keeps the reference's strict rejection behavior; this
  * evaluator is the opt-in extension.
  */
object ExtendedPromQL {

  val OverTimeOps =
    Set("sum", "avg", "count", "min", "max", "last", "stddev", "stdvar")
  val InstantAggOps = Set("sum", "avg", "count", "min", "max", "stddev", "stdvar")
  val RangeFnOps = Set("rate", "increase", "delta")

  sealed trait Query {
    def matchers: Seq[LabelMatcher]
    def startUs: Long
    def endUs: Long
  }
  /** Plain selector — identical to the restricted endpoint's semantics. */
  final case class SelectorQ(
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long) extends Query
  /** `<op>_over_time(sel[range])`. */
  final case class OverTimeQ(
      op: String, matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query
  /** `<op> [by|without (labels)] (sel)`. */
  final case class InstantAggQ(
      op: String, by: Seq[String], without: Boolean,
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long) extends Query
  /** `rate/increase/delta(sel[range])` — counter/gauge range functions.
    * Simplified Prometheus semantics (no boundary extrapolation, which
    * Prometheus itself documents as an approximation): `increase` sums
    * consecutive positive deltas and counts the full new value after a
    * counter reset, `rate` divides that by the range in seconds, `delta`
    * is last−first. Series with fewer than two samples yield no result,
    * matching PromQL.
    */
  final case class RangeFnQ(
      op: String, matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query
  /** `quantile_over_time(φ, sel[range])` — exact per-series φ-quantile
    * with linear interpolation (Prometheus semantics; evaluated with
    * Spark's exact `percentile`, which sorts per series).
    */
  final case class QuantileOverTimeQ(
      phi: Double, matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query

  import SimplePromQL.PromQLError

  /** Selector parse with the PromQL `offset` modifier (absent from the
    * reference's restricted endpoint): `sel [offset <dur>]` shifts the
    * whole evaluation window back by the duration. The greedy prefix
    * regex requires the query to END with the duration, so an `offset`
    * inside a quoted label value (always followed by `"}`) never
    * matches.
    */
  private val OffsetRe = """(?s)^(.*)\s+offset\s+([0-9a-z]+)\s*$""".r

  private def parseSelector(s: String, nowUs: Long): SimplePromQL.ParsedQuery =
    s.trim match {
      case OffsetRe(inner, dur) =>
        val shiftUs = SimplePromQL.parseDurationMs(dur) * 1000L
        val sel = SimplePromQL.parse(inner.trim, nowUs)
        sel.copy(startUs = sel.startUs - shiftUs, endUs = sel.endUs - shiftUs)
      case other => SimplePromQL.parse(other, nowUs)
    }

  def parse(query: String, nowUs: Long): Query = {
    val s = query.trim
    val headRe = """^([a-zA-Z_:][a-zA-Z0-9_:]*)""".r
    headRe.findPrefixMatchOf(s) match {
      case Some(m) =>
        val head = m.matched
        val after = s.substring(head.length)
        if (head == "quantile_over_time") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val comma = inner.indexOf(',')
          if (comma < 0)
            throw PromQLError(
              "quantile_over_time expects (φ, metric[range])")
          val phi =
            try inner.substring(0, comma).trim.toDouble
            catch { case _: NumberFormatException =>
              throw PromQLError(
                s"Bad quantile value '${inner.substring(0, comma).trim}'")
            }
          if (phi < 0.0 || phi > 1.0)
            throw PromQLError(s"Quantile $phi out of [0, 1]")
          val selStr = inner.substring(comma + 1).trim
          if (!selStr.contains("["))
            throw PromQLError(
              "quantile_over_time expects a range selector (like metric[5m])")
          val sel = parseSelector(selStr, nowUs)
          QuantileOverTimeQ(phi, sel.matchers, sel.startUs, sel.endUs)
        } else if (head.endsWith("_over_time")) {
          val op = head.stripSuffix("_over_time")
          if (!OverTimeOps.contains(op))
            throw PromQLError(s"Unsupported function: $head")
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          if (!inner.contains("["))
            throw PromQLError(
              s"$head expects a range selector (like metric[5m])")
          val sel = parseSelector(inner, nowUs)
          OverTimeQ(op, sel.matchers, sel.startUs, sel.endUs)
        } else if (RangeFnOps.contains(head) && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          if (!inner.contains("["))
            throw PromQLError(
              s"$head expects a range selector (like metric[5m])")
          val sel = parseSelector(inner, nowUs)
          RangeFnQ(head, sel.matchers, sel.startUs, sel.endUs)
        } else if (InstantAggOps.contains(head)) {
          // clause may precede or follow the parenthesized body
          var t = after.trim
          var by = Seq.empty[String]
          var without = false
          var haveClause = false
          if (t.startsWith("by") || t.startsWith("without")) {
            without = t.startsWith("without")
            haveClause = true
            val (ls, rest) = parenGroup(
              t.stripPrefix(if (without) "without" else "by").trim, s)
            by = ls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            t = rest.trim
          }
          val (inner, rest0) = parenGroup(t, s)
          var rest = rest0.trim
          if (!haveClause && (rest.startsWith("by") || rest.startsWith("without"))) {
            without = rest.startsWith("without")
            val (ls, r2) = parenGroup(
              rest.stripPrefix(if (without) "without" else "by").trim, s)
            by = ls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            rest = r2.trim
          }
          if (rest.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          if (inner.contains("["))
            throw PromQLError(
              s"$head aggregates an instant vector; use ${head}_over_time " +
                "for range windows")
          val sel = parseSelector(inner, nowUs)
          InstantAggQ(head, by, without, sel.matchers, sel.startUs, sel.endUs)
        } else {
          val sel = parseSelector(s, nowUs)
          SelectorQ(sel.matchers, sel.startUs, sel.endUs)
        }
      case None =>
        val sel = parseSelector(s, nowUs)
        SelectorQ(sel.matchers, sel.startUs, sel.endUs)
    }
  }

  /** Extract a balanced `(...)` group from the head of `t`; returns
    * (inner, rest).
    */
  private def parenGroup(t: String, whole: String): (String, String) = {
    if (!t.startsWith("("))
      throw PromQLError(s"Failed to parse PromQL query at: '$t'")
    var depth = 0
    var i = 0
    var inStr = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (t.substring(1, i), t.substring(i + 1))
        case _ => ()
      }
      i += 1
    }
    throw PromQLError("Failed to parse PromQL query: unbalanced parentheses")
  }

  // -------------------------------------------------------------- evaluate

  private def aggCol(op: String, c: Column): Column = op match {
    case "sum" => sum(c)
    case "avg" => avg(c)
    case "count" => count(c)
    case "min" => min(c)
    case "max" => max(c)
    // Prometheus stddev/stdvar are population statistics
    case "stddev" => stddev_pop(c)
    case "stdvar" => var_pop(c)
    case other => throw PromQLError(s"Unsupported aggregation: $other")
  }

  /** Evaluate against a selected-series frame and its samples.
    *
    * @param selected (sensor_id, labels: map) — the matcher-selected
    *                 series (callers produce it via
    *                 `Matchers.sensorsByLabels`)
    * @param samples  (sensor_id, timestamp_us, value)
    * @return OverTimeQ / RangeFnQ → (sensor_id, labels, value);
    *         InstantAggQ → (group_labels, value);
    *         SelectorQ → (sensor_id, labels, timestamp_us, value)
    */
  def eval(q: Query, selected: DataFrame, samples: DataFrame): DataFrame = {
    val inWindow = samples
      .filter(col("timestamp_us").between(q.startUs, q.endUs))
      .join(broadcast(selected), "sensor_id")
    q match {
      case SelectorQ(_, _, _) =>
        inWindow.select("sensor_id", "labels", "timestamp_us", "value")
      case OverTimeQ(op, _, _, _) =>
        val c = if (op == "last") null else aggCol(op, col("value"))
        if (op == "last") lastInWindow(inWindow)
          .select(col("sensor_id"), col("labels"), col("value"))
        else inWindow.groupBy(col("sensor_id"))
          .agg(first(col("labels")).as("labels"), c.as("value"))
          .select("sensor_id", "labels", "value")
      case QuantileOverTimeQ(phi, _, _, _) =>
        inWindow.groupBy(col("sensor_id"))
          .agg(first(col("labels")).as("labels"),
            percentile(col("value"), lit(phi)).as("value"))
          .select("sensor_id", "labels", "value")
      case RangeFnQ(op, _, startUs, endUs) =>
        // one shuffle on sensor_id (the storage sort key); the lag order
        // includes value so ties on timestamp stay deterministic
        val ord = Window.partitionBy(col("sensor_id"))
          .orderBy(col("timestamp_us"), col("value"))
        op match {
          case "delta" =>
            // last − first via lexicographic (ts, value) struct extrema —
            // deterministic under timestamp ties, no summation involved
            inWindow.groupBy(col("sensor_id"))
              .agg(first(col("labels")).as("labels"),
                (max(struct(col("timestamp_us"), col("value")))
                  .getField("value") -
                  min(struct(col("timestamp_us"), col("value")))
                    .getField("value")).as("value"),
                count(lit(1)).as("__n"))
              .filter(col("__n") >= 2)
              .select("sensor_id", "labels", "value")
          case _ => // increase | rate
            val d = inWindow
              .withColumn("__prev", lag(col("value"), 1).over(ord))
              .withColumn("__d",
                when(col("__prev").isNull, lit(null).cast("double"))
                  .when(col("value") >= col("__prev"),
                    col("value") - col("__prev"))
                  .otherwise(col("value")))
            // plain f64 summation — Prometheus values are f64, and any
            // quantization here (e.g. a decimal cast) would corrupt
            // fractional counter deltas for generic callers; callers that
            // need order-independent comparison round at their own layer
            val agg = d.groupBy(col("sensor_id"))
              .agg(first(col("labels")).as("labels"),
                sum(col("__d")).as("value"))
              .filter(col("value").isNotNull) // <2 samples ⇒ no result
            if (op == "rate")
              agg.withColumn("value",
                col("value") / lit((endUs - startUs) / 1e6))
                .select("sensor_id", "labels", "value")
            else agg.select("sensor_id", "labels", "value")
        }
      case InstantAggQ(op, by, without, _, _, _) =>
        val latest = lastInWindow(inWindow)
        val groupLabels =
          if (by.isEmpty && !without)
            map().cast("map<string,string>") // aggregate everything
          else {
            val keys = array(by.map(lit): _*)
            val entries = map_entries(coalesce(col("labels"),
              map().cast("map<string,string>")))
            val kept =
              if (without)
                filter(entries, e => !array_contains(keys, e.getField("key")))
              else
                filter(entries, e => array_contains(keys, e.getField("key")))
            map_from_entries(kept)
          }
        latest
          .withColumn("group_labels", groupLabels)
          .groupBy(col("group_labels"))
          .agg(aggCol(op, col("value")).as("value"))
    }
  }

  /** Each series' latest sample in the window (deterministic tie-break on
    * value) — PromQL instant-vector semantics at the evaluation timestamp.
    */
  private def lastInWindow(inWindow: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("sensor_id"))
      .orderBy(col("timestamp_us").desc, col("value").desc)
    inWindow
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

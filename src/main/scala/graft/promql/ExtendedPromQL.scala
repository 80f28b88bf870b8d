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
  *    by the label clause (sum/avg/count/min/max);
  *  - `topk(k, sel)` / `bottomk(k, sel)` — deterministic global ranking
  *    of the instant vector (TakeOrderedAndProject, never a full sort);
  *  - binary expressions `vec ⊙ vec` (one-to-one label matching on the
  *    canonical sorted-entries form of the labels map) and `vec ⊙ scalar`
  *    for + - * /, with selectors and per-series range functions as
  *    operands (`rate(a[5m]) / rate(b[5m])`).
  *
  * Selector parsing (matchers, ranges, durations, rejection of binary ops
  * etc.) is delegated to [[SimplePromQL]], so reference-compatible
  * selector semantics — 1h default lookback, inclusive bounds — carry
  * over; the `offset <dur>` modifier (also absent from the reference) is
  * handled here by shifting the evaluation window. [[SimplePromQL]]
  * itself keeps the reference's strict rejection behavior; this
  * evaluator is the opt-in extension.
  *
  * Documented deviations from upstream Prometheus (beyond the
  * inclusive-bounds convention noted on [[SubqueryOverTimeQ]]): the
  * duration grammar accepts unit terms in any order with repeats
  * (`1h30m` ≡ `30m1h`), a strict superset of Prometheus's
  * descending-unique order; `@` on a sub-expression of a range query
  * rejects (whole-expression pins evaluate once and replicate — see
  * [[evalRangeApi]]). NESTED subqueries
  * (`max_over_time(min_over_time(x[5m:1m])[1h:5m])`) and binary
  * vector/set/dynamic-scalar operands inside subqueries — the SLO
  * burn-rate shape `max_over_time((errors/requests)[1h:5m])` — now
  * EVALUATE (r14) through [[perStepAny]]: one scan pass per leaf
  * operand with the broadcast step grid, operands joined per
  * (matching-labels, step), nested grids shared across outer steps.
  */
object ExtendedPromQL {

  // "present" is present_over_time's op: 1.0 for every series with at
  // least one sample in the window (Prometheus semantics — the grouped
  // aggregation only ever sees series WITH samples, so it is constant 1)
  val OverTimeOps =
    Set("sum", "avg", "count", "min", "max", "last", "stddev", "stdvar",
      "present")
  val InstantAggOps =
    Set("sum", "avg", "count", "min", "max", "stddev", "stdvar", "group")
  val RangeFnOps = Set("rate", "increase", "delta", "resets", "changes",
    "idelta", "irate", "deriv")
  /** Per-value math functions (PromQL's scalar function family): name →
    * number of scalar args AFTER the vector operand (round's step is
    * optional, so it carries a range).
    */
  val MathFnArity: Map[String, Range] = Map(
    "abs" -> (0 to 0), "ceil" -> (0 to 0), "floor" -> (0 to 0),
    "sqrt" -> (0 to 0), "exp" -> (0 to 0), "ln" -> (0 to 0),
    "log2" -> (0 to 0), "log10" -> (0 to 0), "sgn" -> (0 to 0),
    "round" -> (0 to 1), "clamp_min" -> (1 to 1), "clamp_max" -> (1 to 1),
    "clamp" -> (2 to 2),
    // the Prometheus 2.31 trigonometry family (promql/functions.go);
    // deg/rad are the degree<->radian conversions
    "sin" -> (0 to 0), "cos" -> (0 to 0), "tan" -> (0 to 0),
    "asin" -> (0 to 0), "acos" -> (0 to 0), "atan" -> (0 to 0),
    "sinh" -> (0 to 0), "cosh" -> (0 to 0), "tanh" -> (0 to 0),
    "deg" -> (0 to 0), "rad" -> (0 to 0),
    // time functions over vector VALUES (epoch seconds, UTC) -- the
    // Prometheus family; pair with timestamp(sel) for sample times
    "minute" -> (0 to 0), "hour" -> (0 to 0), "day_of_week" -> (0 to 0),
    "day_of_month" -> (0 to 0), "day_of_year" -> (0 to 0),
    "days_in_month" -> (0 to 0),
    "month" -> (0 to 0), "year" -> (0 to 0))

  /** The documented Prometheus-3 delta (served at /docs/promql_delta):
    * functions that exist in Prometheus 3.x but are structurally or
    * deliberately absent HERE — each name rejects with its reason
    * instead of mis-parsing as a metric selector. Everything else in
    * the Prometheus 3 function list evaluates (incl. the experimental
    * limitk/limit_ratio/sort_by_label family and
    * double_exponential_smoothing).
    */
  val UnsupportedFns: Map[String, String] = {
    val histo = "native-histogram sample types do not exist in this " +
      "data model (float/integer/numeric/string/boolean/location/json/" +
      "blob — reference src/datamodel); classic bucket histograms are " +
      "served by histogram_quantile"
    val tsOf = "experimental (Prometheus 3.5 feature flag); pair " +
      "timestamp() with the base selector instead"
    Map(
      "histogram_count" -> histo, "histogram_sum" -> histo,
      "histogram_avg" -> histo, "histogram_fraction" -> histo,
      "histogram_stddev" -> histo, "histogram_stdvar" -> histo,
      "info" -> ("experimental OTel target_info metadata join; the " +
        "catalog API (/series, /api/v1/metadata) serves sensor " +
        "metadata instead"),
      "ts_of_last_over_time" -> tsOf, "ts_of_max_over_time" -> tsOf,
      "ts_of_min_over_time" -> tsOf)
  }

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
  /** `<op> [by|without (labels)] (<per-series expr>)` — cross-series
    * aggregation over a FUNCTION result: `sum(rate(x[5m]))`, the
    * canonical PromQL reduction (the reference rejects every
    * aggregation; the plain-selector form is [[InstantAggQ]]). The inner
    * evaluates to one row per series; the fold groups by the kept
    * labels — one extra shuffle keyed on the (tiny) group-label map.
    */
  final case class InstantAggVecQ(
      op: String, by: Seq[String], without: Boolean, inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `quantile [by|without (...)] (φ, vec)` — the cross-series
    * φ-quantile aggregation (the one parameterized member of the
    * instant-aggregation family): exact per-group quantile with linear
    * interpolation over the instant vector, grouped by the kept
    * labels.
    */
  final case class QuantileAggQ(
      phi: Double, by: Seq[String], without: Boolean, inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
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
  /** `mad_over_time(sel[range])` — per-series median absolute deviation:
    * median(|x − median(x)|), both medians with Prometheus's
    * linear-interpolation quantile rule. Needs the window median before
    * the deviations exist, so evaluation is two sensor-keyed aggregates
    * with a sensor-keyed join between them — still nothing broader than
    * the series key ever shuffles.
    */
  final case class MadOverTimeQ(
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query
  /** `predict_linear(sel[range], t)` — the value `t` seconds past the
    * window end under a per-series least-squares fit over
    * (seconds-from-window-end, value): `intercept + slope·t` via the
    * codegen'd `regr_*` aggregates. Series with <2 points yield nothing.
    */
  final case class PredictLinearQ(
      horizonS: Double, matchers: Seq[LabelMatcher],
      startUs: Long, endUs: Long) extends Query
  /** `holt_winters(sel[range], sf, tf)` — Prometheus double exponential
    * smoothing: per series, the smoothed value after sequentially
    * folding the window's samples with smoothing factor `sf` and trend
    * factor `tf` (both in (0,1)). The recursion is inherently
    * sequential, so evaluation is a per-series sorted fold
    * (`flatMapGroups`) — one shuffle on sensor_id, state O(1) per
    * series. Series with fewer than two samples yield no result.
    */
  final case class HoltWintersQ(
      sf: Double, tf: Double, matchers: Seq[LabelMatcher],
      startUs: Long, endUs: Long) extends Query
  /** `sort(v)` / `sort_desc(v)` — the instant vector ordered by value
    * (ties by sensor_id), surfaced as an explicit `rank` column. The
    * rank window is global but runs over the per-SERIES vector (one row
    * per series, catalog-bounded), the same shape [[TopKQ]] ranks.
    */
  /** `sort_by_label[_desc](vec, "l1", "l2", …)` — the instant vector
    * ranked by label VALUES instead of sample values (Prometheus 3
    * experimental; ties fall through the label list, then the series
    * id). Missing labels sort as empty strings, matching Prometheus's
    * empty-label convention.
    */
  final case class SortByLabelQ(
      desc: Boolean, labels: Seq[String], inner: Query) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  final case class SortQ(desc: Boolean, inner: Query) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `timestamp(sel)` — each series' latest-sample TIMESTAMP as the
    * value, in float seconds (PromQL semantics). Composes with the
    * time-of-day math functions: `hour(timestamp(sel))`.
    */
  final case class TimestampQ(
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long) extends Query
  /** `topk(k, sel)` / `bottomk(k, sel)` — the k series with the
    * largest/smallest latest sample in the lookback window, ranked
    * deterministically ((value desc|asc), sensor_id). Without a clause
    * the ranking is global and the input is one row per SERIES, so the
    * final top-k is `TakeOrderedAndProject`, never a full sort; a
    * `by (labels)` / `without (labels)` clause ranks per group
    * (Prometheus grouped topk) via the WindowGroupLimit shape.
    */
  final case class TopKQ(
      op: String, k: Int, by: Seq[String], without: Boolean,
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long) extends Query
  /** `limitk(k, vec)` — the k series with the smallest deterministic
    * label-hash draws (Prometheus 3's experimental deterministic
    * sampling aggregation: membership depends only on the label set,
    * so it is stable across evals and replayable).
    */
  final case class LimitKQ(
      k: Int, matchers: Seq[LabelMatcher],
      startUs: Long, endUs: Long) extends Query
  /** `limit_ratio(r, vec)` — keeps the series whose label-hash draw
    * falls below `r`; a negative `r` keeps the complement, so
    * `limit_ratio(r)` and `limit_ratio(r − 1)` partition the vector
    * exactly (the Prometheus 3 contract).
    */
  final case class LimitRatioQ(
      r: Double, matchers: Seq[LabelMatcher],
      startUs: Long, endUs: Long) extends Query
  /** `sel <op> scalar` / `scalar <op> sel` for + - * / — arithmetic on
    * an instant vector (each series' latest sample, or a range
    * function's per-series result).
    */
  final case class BinScalarQ(
      op: Char, scalar: Double, scalarOnLeft: Boolean, inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `abs/ceil/floor/sqrt/exp/ln/log2/log10/sgn/round/clamp*(vec, ...)`
    * — PromQL's per-value math functions over an instant vector; scalar
    * arguments (round's step, clamp's bounds) follow the vector operand.
    * Prometheus float semantics: `ln(0) = -Inf`, `ln(x<0) = NaN` (and
    * likewise log2/log10), `sqrt(x<0) = NaN`, `round` resolves ties
    * upward (`floor(v/to + 0.5) * to`), `clamp` with min > max yields
    * NaN. Deviations: `ceil`/`floor`/`round` pass through a 64-bit
    * integer stage, so inputs beyond ±2^63 overflow (Prometheus floats
    * that large are already integral, so only absurd magnitudes differ).
    */
  final case class MathFnQ(fn: String, args: Seq[Double], inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `vec1 <op> [on(...)|ignoring(...)] vec2` for + - * / — one-to-one
    * vector matching on the FULL label set by default (Prometheus
    * semantics with the metric name excluded; labels here never include
    * the name), restricted to `on` labels or the complement of
    * `ignoring` labels when a modifier is present. Output labels are the
    * matching labels (Prometheus one-to-one semantics). Operands are
    * arbitrary vector expressions — selectors, per-series functions
    * (`rate(a[5m]) / rate(b[5m])`), and aggregations (`sum(a) / sum(b)`,
    * whose group-label maps match exactly like Prometheus's
    * name-stripped label sets). Duplicate match-label sets
    * on a side produce a many-to-many join — callers needing
    * Prometheus's hard error should validate cardinality beforehand.
    * Evaluate via [[evalWith]] (two independent matcher sets need two
    * catalog selections).
    */
  final case class BinVectorQ(
      op: Char, left: Query, right: Query,
      matchOn: Seq[String] = Nil, ignoring: Boolean = false,
      grouping: Option[String] = None, // Some("left") | Some("right")
      groupCopy: Seq[String] = Nil) // group_left(l1,...) labels copied
      extends Query {                 // from the "one" side

    def matchers: Seq[LabelMatcher] = left.matchers
    def startUs: Long = math.min(left.startUs, right.startUs)
    def endUs: Long = math.max(left.endUs, right.endUs)
  }
  /** `vec <cmp> scalar` (or `scalar <cmp> vec`) for > >= < <= == != —
    * Prometheus comparison filtering: series failing the predicate drop
    * out and survivors keep their value; with the `bool` modifier every
    * series survives with value 1.0/0.0 instead.
    */
  final case class BinCmpQ(
      op: String, scalar: Double, scalarOnLeft: Boolean, bool: Boolean,
      inner: Query) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `vector(s)` — PromQL's scalar→vector conversion: a one-element
    * instant vector with an empty label set. The idiomatic use is the
    * `expr or vector(0)` empty-result fallback. (The reference's
    * restricted endpoint rejects every function call:
    * src/ingestors/http/simple_promql.rs:153-155.)
    */
  final case class VectorLitQ(value: Double) extends Query {
    def matchers: Seq[LabelMatcher] = Seq.empty
    // a literal consumes NO samples: report a neutral (inverted) window
    // so a binary/set parent's min/max window derivation collapses to
    // the other operand's — a [0, 0] window here made `x or vector(0)`
    // widen the caller's scan bound to [epoch, now], a full-history
    // scan at scale for the most idiomatic fallback query
    def startUs: Long = Long.MaxValue
    def endUs: Long = Long.MinValue
  }
  /** `scalar(vec)` — vector→scalar conversion: the single series' value
    * when the inner vector has exactly one element, NaN otherwise
    * (Prometheus semantics). Standalone it evaluates to one unlabeled
    * row; as a binary-arithmetic operand it becomes the dynamic scalar
    * of [[BinDynScalarQ]].
    */
  final case class ScalarQ(inner: Query) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `vec <op> scalar(other)` for + - * / — arithmetic against a scalar
    * computed at evaluation time. The one-row scalar frame is broadcast
    * into a cross join, a constant-cost nested-loop broadcast at any
    * vector size. Evaluate via [[evalWith]] so the two operands select
    * their series independently.
    */
  final case class BinDynScalarQ(
      op: Char, scalarQ: ScalarQ, scalarOnLeft: Boolean, inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = math.min(inner.startUs, scalarQ.startUs)
    def endUs: Long = math.max(inner.endUs, scalarQ.endUs)
  }
  /** `vec1 and|or|unless vec2` — Prometheus set operators between
    * instant vectors, matching on the FULL label set: `and` keeps left
    * rows whose label set also appears on the right (semi join),
    * `unless` keeps those that don't (anti join), `or` returns the left
    * plus right rows whose label set has no left row. Values and labels
    * always come from the contributing side. Evaluate via [[evalWith]].
    */
  final case class BinSetQ(op: String, left: Query, right: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = left.matchers
    def startUs: Long = math.min(left.startUs, right.startUs)
    def endUs: Long = math.max(left.endUs, right.endUs)
  }
  /** `count_values("label", sel)` — frequency of each distinct latest
    * value across the instant vector, keyed as a one-entry labels map.
    */
  final case class CountValuesQ(
      label: String, matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query
  /** `absent(sel)` — a single row with value 1.0 when NO series matches
    * (or none has a sample in the window); empty result otherwise.
    */
  final case class AbsentQ(
      matchers: Seq[LabelMatcher], startUs: Long, endUs: Long) extends Query
  /** `label_replace(vec, dst, replacement, src, regex)` — when `regex`
    * FULLY matches the `src` label's value (absent ⇒ empty string), set
    * `dst` to the expansion of `replacement` ($1… group refs); series
    * that don't match pass through unchanged; an empty expansion drops
    * `dst`. Operand rules follow the binary-op operands (selectors /
    * per-series functions).
    */
  final case class LabelReplaceQ(
      dst: String, replacement: String, src: String, regex: String,
      inner: Query) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `label_join(vec, dst, sep, src1, src2, ...)` — `dst` becomes the
    * `sep`-joined values of the source labels (absent ⇒ empty string).
    */
  final case class LabelJoinQ(
      dst: String, sep: String, srcs: Seq[String], inner: Query)
      extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    def startUs: Long = inner.startUs
    def endUs: Long = inner.endUs
  }
  /** `histogram_quantile(φ, sel)` — Prometheus histogram interpolation
    * over `le`-labeled cumulative bucket series: per group (labels minus
    * `le`), rank = φ·total, find the first bucket whose cumulative count
    * covers the rank, interpolate linearly inside it (first bucket's
    * lower bound is 0; the +Inf bucket resolves to the highest finite
    * `le`). Groups whose total is 0 drop out. Assumes monotone bucket
    * counts (no NaN repair pass).
    */
  final case class HistogramQuantileQ(
      phi: Double, matchers: Seq[LabelMatcher], startUs: Long, endUs: Long)
      extends Query
  /** `<op>_over_time(<inner>[range:step])` — a PromQL SUBQUERY (rejected
    * by the reference alongside every other function: src/ingestors/http/
    * simple_promql.rs:150-171, and previously unsupported here too): the
    * inner expression is evaluated as an instant vector at every
    * step-aligned timestamp in `[end − range, end]` (Prometheus
    * alignment: evaluation times are the multiples of `step` inside the
    * range), and the outer `<op>_over_time` folds each series' step
    * values. `phi` carries quantile_over_time's φ.
    *
    * Inner expressions evaluate per (series, step) with the window
    * re-anchored to the step: selectors contribute their latest sample
    * in the lookback window ending at the step, `<agg>_over_time` /
    * `quantile_over_time` / rate / increase / delta their window result,
    * and scalar arithmetic / comparison wrappers apply per step value.
    * An inner `offset` shifts every step window back uniformly
    * (`innerShiftUs`); `innerSpanUs` is the inner window length (the
    * lookback for plain selectors, the bracketed range otherwise).
    * Cross-series aggregations evaluate per step over that step's
    * vector (`max_over_time(sum(rate(x[5m]))[1h:5m])`, the canonical
    * alerting shape); the aggregate's group labels become the series
    * identity the outer fold groups on. Binary vector/set operands and
    * nested subqueries evaluate through [[perStepAny]] (r14).
    *
    * Boundary convention: each step window is CLOSED ON BOTH ENDS
    * (`timestamp_us >= lo && <= hi`), matching this engine's pervasive
    * inclusive `between()` convention — a sample sitting exactly on a
    * step boundary therefore contributes to both adjacent step windows.
    * This is a deliberate, documented deviation from upstream
    * Prometheus, whose range windows are left-open.
    */
  final case class SubqueryOverTimeQ(
      op: String, phi: Option[Double], inner: Query,
      rangeUs: Long, stepUs: Long, evalEndUs: Long,
      innerShiftUs: Long, innerSpanUs: Long) extends Query {
    def matchers: Seq[LabelMatcher] = inner.matchers
    // the scan span: earliest window start of the first step through the
    // latest window end of the last step (both shifted by inner offset)
    def startUs: Long = evalEndUs - rangeUs - innerShiftUs - innerSpanUs
    def endUs: Long = evalEndUs - innerShiftUs
  }

  import SimplePromQL.PromQLError

  /** Selector parse with the PromQL `offset` and `@` modifiers (both
    * absent from the reference's restricted endpoint): `sel [offset
    * <dur>]` shifts the whole evaluation window back by the duration;
    * `sel @ <unix_seconds>` pins the evaluation time absolutely (so a
    * client can replay historical instants against the serving
    * endpoint, whose default reference is wall-clock now). `@` binds
    * the reference time first; an `offset` inside then shifts relative
    * to it. The modifiers are recognized as the final TOKENS of the
    * query ([[PromQLLexer]]), so keywords inside quoted label values
    * never match by construction.
    */
  import PromQLLexer.{Tok, lex}

  /** Trailing `@ <unix_seconds>` modifier: Some((inner, seconds)) when
    * the query ENDS with `@ number` (whitespace around `@` optional —
    * Prometheus tokenizes). Token-tail matching replaces the old greedy
    * prefix regex: a quoted label value can never BE the final two
    * tokens, so values containing `@` stay inert by construction.
    */
  private def trailingAt(s: String): Option[(String, String)] = {
    val toks = lex(s)
    if (toks.length < 2) None
    else {
      val at = toks(toks.length - 2)
      val num = toks.last
      if (at.kind == PromQLLexer.Op && at.text == "@" &&
          num.kind == PromQLLexer.Num &&
          num.text.matches("[0-9]+(\\.[0-9]+)?"))
        Some((s.substring(0, at.start), num.text))
      else None
    }
  }

  /** Trailing `offset <dur>` modifier (whitespace-preceded, like the
    * reference grammar): Some((inner, duration)).
    */
  private def trailingOffset(s: String): Option[(String, String)] = {
    val toks = lex(s)
    if (toks.length < 2) None
    else {
      val kw = toks(toks.length - 2)
      val d = toks.last
      val durShaped = (d.kind == PromQLLexer.Dur ||
        d.kind == PromQLLexer.Num || d.kind == PromQLLexer.Ident) &&
        d.text.matches("[0-9a-z]+")
      if (kw.kind == PromQLLexer.Ident && kw.text == "offset" &&
          kw.start > 0 && s.charAt(kw.start - 1).isWhitespace && durShaped)
        Some((s.substring(0, kw.start), d.text))
      else None
    }
  }

  private def parseSelector(s: String, nowUs: Long): SimplePromQL.ParsedQuery = {
    val t = s.trim
    trailingAt(t) match {
      case Some((inner, ts)) =>
        parseSelector(inner.trim, (ts.toDouble * 1e6).toLong)
      case None => trailingOffset(t) match {
        case Some((inner, dur)) =>
          val shiftUs = SimplePromQL.msToUs(SimplePromQL.parseDurationMs(dur))
          val sel = parseSelector(inner.trim, nowUs)
          sel.copy(startUs = sel.startUs - shiftUs, endUs = sel.endUs - shiftUs)
        case None => SimplePromQL.parse(t, nowUs)
      }
    }
  }

  /** The binary-operator SPLIT POINT (+ - * / % ^, or the word operator
    * `atan2`) at top level — outside quotes and all bracket kinds.
    * Prometheus precedence and associativity decide which occurrence
    * splits: the expression divides at the LAST operator of the lowest
    * tier present (`+ -` below `* / % atan2` below `^`), so
    * left-associative chains group left (`a - b - c` = `(a - b) - c`,
    * `a * b + c` = `(a * b) + c`); `^` alone is right-associative and
    * splits at its FIRST occurrence. A `+`/`-` whose previous
    * non-space character is another operator or an opening paren (or
    * the string start) is a scalar SIGN, not an operator, as is the
    * exponent sign inside scientific notation. `atan2` only counts
    * with non-name-char boundaries, so `atan2_total` or `x_atan2`
    * never read as operators. Returns (index, operator length,
    * operator tag — the symbol itself, or 'A' for atan2).
    */
  private def topLevelOp(s: String): Option[(Int, Int, Char)] = {
    val toks = lex(s)
    var addSub: Option[(Int, Int, Char)] = None // tier 0: + - (last)
    var mulDiv: Option[(Int, Int, Char)] = None // tier 1: * / % atan2 (last)
    var pow: Option[(Int, Int, Char)] = None    // tier 2: ^ (FIRST: right-assoc)
    // a +/- is a scalar SIGN, not an operator, when nothing or another
    // operator/open-paren/comma precedes it (`x * -3`, `f(, -2)`,
    // `x atan2 -3`); exponent signs never reach here — the lexer folds
    // `1e-3` into one number token
    def signContext(prev: Option[Tok]): Boolean = prev match {
      case None => true
      case Some(p) =>
        (p.kind == PromQLLexer.Op && "+-*/%^".contains(p.text)) ||
        (p.kind == PromQLLexer.Punct && (p.text == "(" || p.text == ",")) ||
        (p.kind == PromQLLexer.Ident && p.text == "atan2" && p.depth == 0)
    }
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.depth == 0) {
        val prev = if (i > 0) Some(toks(i - 1)) else None
        t.kind match {
          case PromQLLexer.Ident if t.text == "atan2" && i > 0 =>
            mulDiv = Some((t.start, 5, 'A'))
          case PromQLLexer.Op => t.text match {
            case "+" | "-" if signContext(prev) => ()
            case "+" | "-" => addSub = Some((t.start, 1, t.text.head))
            case "*" | "/" | "%" => mulDiv = Some((t.start, 1, t.text.head))
            case "^" => if (pow.isEmpty) pow = Some((t.start, 1, '^'))
            case _ => ()
          }
          case _ => ()
        }
      }
      i += 1
    }
    addSub.orElse(mulDiv).orElse(pow)
  }

  private def parseScalar(s: String): Option[Double] =
    try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }

  // metric-name chars (letters, digits, '_', ':') bound operator words —
  // `foo_and_bar` or `band` must not read as operators
  private def isNameChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == ':'

  /** LAST top-level comparison operator (> >= < <= == !=) outside
    * quotes/brackets — comparisons are left-associative in Prometheus,
    * so a chain like `a > 1 < 2` splits at the final operator and the
    * left side recurses (`(a > 1) < 2`). Returns (index, operator).
    */
  private def topLevelCmpOp(s: String): Option[(Int, String)] = {
    val cmps = Set(">", ">=", "<", "<=", "==", "!=")
    lex(s).filter(t => t.depth == 0 && t.kind == PromQLLexer.Op &&
        cmps.contains(t.text))
      .lastOption.map(t => (t.start, t.text))
  }

  /** The set-operator SPLIT POINT (`and` / `or` / `unless` as whole
    * words outside quotes/brackets). Prometheus precedence: `or` binds
    * loosest, `and`/`unless` one tier tighter, all left-associative —
    * so the expression divides at the LAST `or` when one exists
    * (`a and b or c` = `(a and b) or c`), otherwise at the LAST
    * `and`/`unless` (`a unless b unless c` = `(a unless b) unless c`;
    * a first-occurrence split would evaluate the right-associative
    * grouping, a semantically different set). Returns (opIndex, opLength).
    */
  private def topLevelSetOp(s: String): Option[(Int, Int)] = {
    var lastOr: Option[(Int, Int)] = None
    var lastAndUnless: Option[(Int, Int)] = None
    lex(s).foreach { t =>
      if (t.depth == 0 && t.kind == PromQLLexer.Ident && t.start > 0)
        t.text match {
          case "or" => lastOr = Some((t.start, 2))
          case "and" => lastAndUnless = Some((t.start, 3))
          case "unless" => lastAndUnless = Some((t.start, 6))
          case _ => ()
        }
    }
    lastOr.orElse(lastAndUnless)
  }

  /** A query string that can only have been MEANT as a plain selector:
    * no function-call head (`name(`) and no top-level binary operator,
    * so the full-parse fallback has nothing to recurse into and its
    * failure message would be less specific than the selector parser's.
    */
  private def selectorShaped(s: String): Boolean = {
    val t = s.trim
    val isCall = """^[a-zA-Z_:][a-zA-Z0-9_:]*\s*\(""".r
      .findPrefixMatchOf(t).isDefined
    !isCall && !t.startsWith("(") && topLevelOp(t).isEmpty
  }

  /** Every query shape evaluates to an instant vector except `scalar()`
    * — Prometheus composes aggregations, ranked vectors, and binary
    * results as operands freely (`sum(a) / sum(b)`, `sum(x) or
    * vector(0)`, `abs(a - b)`), and [[operandVec]] normalizes each
    * operand to the (sensor_id, labels, value) vector shape, so the only
    * rejection left is the genuinely non-vector operand.
    */
  private def requireVectorOperand(q: Query, side: String): Query = q match {
    case _: ScalarQ => throw PromQLError(
      s"$side operand must be an instant vector — scalar() produces a " +
        "scalar (use it directly as the scalar side of an arithmetic op)")
    case _ => q
  }

  /** `[range:step]` at the tail of an expression — the subquery form,
    * recognized as the final five TOKENS, so an inner selector range
    * (`rate(x[5m])[1h:5m]`) naturally splits at the LAST bracket group.
    */
  private def trailingSubquery(s: String): Option[(String, String, String)] = {
    val toks = lex(s)
    if (toks.length < 5) None
    else {
      val Seq(lb, r, colon, st, rb) = toks.takeRight(5)
      def durTok(t: Tok): Boolean =
        (t.kind == PromQLLexer.Dur || t.kind == PromQLLexer.Num) &&
          t.text.matches("[0-9a-z]+")
      if (lb.kind == PromQLLexer.Punct && lb.text == "[" &&
          colon.kind == PromQLLexer.Punct && colon.text == ":" &&
          rb.kind == PromQLLexer.Punct && rb.text == "]" &&
          durTok(r) && durTok(st))
        Some((s.substring(0, lb.start), r.text, st.text))
      else None
    }
  }

  private def validSubqueryInner(q: Query): Boolean = q match {
    case _: SelectorQ | _: OverTimeQ | _: RangeFnQ | _: QuantileOverTimeQ =>
      true
    case b: BinScalarQ => validSubqueryInner(b.inner)
    case b: BinCmpQ => validSubqueryInner(b.inner)
    case m: MathFnQ => validSubqueryInner(m.inner)
    // cross-series aggregations evaluate per step over the step's
    // instant/range vector — max_over_time(sum(rate(x[5m]))[1h:5m]) is
    // the canonical alerting shape; the aggregate's GROUP labels become
    // the series identity the outer fold groups on
    case _: InstantAggQ => true
    case a: InstantAggVecQ => validSubqueryInner(a.inner)
    case qa: QuantileAggQ => validSubqueryInner(qa.inner)
    // binary vector/set/dynamic-scalar operands and NESTED subqueries
    // evaluate per step through perStepAny (each leaf keeps its own
    // one-scan perStepVector pass; operands join on (key, step))
    case b: BinVectorQ =>
      validSubqueryInner(b.left) && validSubqueryInner(b.right)
    case b: BinSetQ =>
      validSubqueryInner(b.left) && validSubqueryInner(b.right)
    case b: BinDynScalarQ =>
      validSubqueryInner(b.inner) && validSubqueryInner(b.scalarQ.inner)
    case sq: SubqueryOverTimeQ => validSubqueryInner(sq.inner)
    case _: VectorLitQ => true
    case _ => false
  }

  /** Shapes [[perStepVector]] cannot one-scan: they route through
    * [[perStepAny]], which recursively gives each leaf operand its own
    * perStepVector pass and composes the results per (series, step).
    */
  private def needsPerStepAny(q: Query): Boolean = q match {
    case _: BinVectorQ | _: BinSetQ | _: BinDynScalarQ |
         _: SubqueryOverTimeQ | _: VectorLitQ => true
    case b: BinScalarQ => needsPerStepAny(b.inner)
    case b: BinCmpQ => needsPerStepAny(b.inner)
    case m: MathFnQ => needsPerStepAny(m.inner)
    case a: InstantAggVecQ => needsPerStepAny(a.inner)
    case qa: QuantileAggQ => needsPerStepAny(qa.inner)
    case _ => false
  }

  /** Whether the subtree contains an operand with its OWN matcher set
    * (so a caller holding one pre-selected frame cannot evaluate it).
    */
  private def hasOwnSelection(q: Query): Boolean = q match {
    case _: BinVectorQ | _: BinSetQ | _: BinDynScalarQ => true
    case b: BinScalarQ => hasOwnSelection(b.inner)
    case b: BinCmpQ => hasOwnSelection(b.inner)
    case m: MathFnQ => hasOwnSelection(m.inner)
    case a: InstantAggVecQ => hasOwnSelection(a.inner)
    case qa: QuantileAggQ => hasOwnSelection(qa.inner)
    case sq: SubqueryOverTimeQ => hasOwnSelection(sq.inner)
    case _ => false
  }

  /** Parse `body` as `<inner>[range:step]` when it has the subquery tail;
    * None otherwise (plain range selectors have no `:`).
    */
  private def parseSubquery(
      op: String, phi: Option[Double], body: String,
      nowUs: Long): Option[Query] = trailingSubquery(body.trim) match {
    case Some((innerStr, rangeD, stepD)) =>
      val rangeUs = SimplePromQL.msToUs(SimplePromQL.parseDurationMs(rangeD))
      val stepUs = SimplePromQL.msToUs(SimplePromQL.parseDurationMs(stepD))
      if (rangeUs <= 0 || stepUs <= 0)
        throw PromQLError("Subquery range and step must be positive")
      if (rangeUs / stepUs > 100000L)
        throw PromQLError(
          s"Subquery [$rangeD:$stepD] resolves to more than 100000 steps")
      val inner = parse(innerStr.trim, nowUs)
      if (!validSubqueryInner(inner))
        throw PromQLError(
          "Subquery inner expression must be a selector or a per-series " +
            "function (cross-series aggregations are not subquery operands)")
      Some(SubqueryOverTimeQ(op, phi, inner, rangeUs, stepUs, nowUs,
        innerShiftUs = nowUs - inner.endUs,
        innerSpanUs = inner.endUs - inner.startUs))
    case _ => None
  }

  /** Parse with PromQL's `@ start()` / `@ end()` anchors resolved
    * against an explicit evaluation range (a range query's start/end
    * parameters). Both anchors default to the instant evaluation time
    * when the range bound is absent — Prometheus's instant-query
    * semantics, where start() == end() == the query time. The anchors
    * are rewritten, quote-aware, to the numeric `@ <seconds>` modifier
    * the selector parser already supports, so `offset`/`@` composition
    * rules are inherited unchanged.
    */
  def parse(query: String, nowUs: Long,
      rangeStartUs: Option[Long], rangeEndUs: Option[Long]): Query =
    parse(
      resolveAtAnchors(query, rangeStartUs.getOrElse(nowUs),
        rangeEndUs.getOrElse(nowUs)),
      nowUs)

  /** Rewrite `@ start()` / `@ end()` (outside quoted label values) to
    * `@ <unix_seconds>`. Exact: microseconds render as a fixed 6-digit
    * decimal fraction, which the `@` modifier parses back losslessly.
    */
  private def resolveAtAnchors(
      query: String, startUs: Long, endUs: Long): String = {
    def secs(us: Long): String = {
      require(us >= 0, s"@ anchor must be a non-negative time, got $us")
      (us / 1000000L).toString + "." + "%06d".format(us % 1000000L)
    }
    val AnchorRe = """^\s*(start|end)\(\)""".r
    val out = new StringBuilder
    var inStr = false
    var i = 0
    while (i < query.length) {
      val c = query.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\\' && i + 1 < query.length) {
          out.append(query.charAt(i + 1)); i += 1
        } else if (c == '"') inStr = false
      } else if (c == '"') { inStr = true; out.append(c) }
      else if (c == '@') {
        AnchorRe.findPrefixMatchOf(query.substring(i + 1)) match {
          case Some(m) =>
            out.append("@ ").append(
              secs(if (m.group(1) == "start") startUs else endUs))
            i += m.end
          case None => out.append(c)
        }
      } else out.append(c)
      i += 1
    }
    out.toString
  }

  /** Rewrite the zero-arg scalar functions `time()` (evaluation time in
    * float epoch seconds — Prometheus promql/functions.go funcTime) and
    * `pi()` to literal scalars, outside quoted label values and only at
    * name boundaries (`uptime()` is untouched). Substitution makes them
    * compose with every scalar-vector context for free and is
    * idempotent, so the recursive parse re-scanning substrings is
    * harmless.
    */
  private def resolveZeroArgFns(query: String, nowUs: Long): String = {
    if (!query.contains("time()") && !query.contains("pi()")) return query
    val timeLit = (nowUs / 1000000L).toString + "." +
      "%06d".format(nowUs % 1000000L)
    val piLit = math.Pi.toString
    val out = new StringBuilder
    var inStr = false
    var i = 0
    while (i < query.length) {
      val c = query.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\\' && i + 1 < query.length) {
          out.append(query.charAt(i + 1)); i += 1
        } else if (c == '"') inStr = false
        i += 1
      } else if (c == '"') { inStr = true; out.append(c); i += 1 }
      else {
        val atBoundary = i == 0 || !isNameChar(query.charAt(i - 1))
        if (atBoundary && query.startsWith("time()", i)) {
          out.append(timeLit); i += 6
        } else if (atBoundary && query.startsWith("pi()", i)) {
          out.append(piLit); i += 4
        } else { out.append(c); i += 1 }
      }
    }
    out.toString
  }

  def parse(query: String, nowUs: Long): Query = {
    val s = resolveZeroArgFns(query.trim, nowUs)
    // a paren group spanning the whole expression unwraps structurally
    // (`(view % 7) ^ 2` recurses into `view % 7`); selector-level parens
    // are still handled by the selector parser unchanged
    if (s.startsWith("(")) {
      val (inner, rest) = parenGroup(s, s)
      if (rest.trim.isEmpty) return parse(inner, nowUs)
    }
    topLevelSetOp(s) match {
      case Some((i, len)) =>
        val op = s.substring(i, i + len)
        val (ls, rs) = (s.substring(0, i).trim, s.substring(i + len).trim)
        if (ls.isEmpty || rs.isEmpty)
          throw PromQLError(s"Set operator '$op' is missing an operand")
        return BinSetQ(op,
          requireVectorOperand(parse(ls, nowUs), "left"),
          requireVectorOperand(parse(rs, nowUs), "right"))
      case None => ()
    }
    topLevelCmpOp(s) match {
      case Some((i, op)) =>
        val ls = s.substring(0, i).trim
        var rs = s.substring(i + op.length).trim
        var bool = false
        if (rs.startsWith("bool") &&
            (rs.length == 4 || !isNameChar(rs.charAt(4)))) {
          bool = true
          rs = rs.substring(4).trim
        }
        if (ls.isEmpty || rs.isEmpty)
          throw PromQLError(s"Comparison '$op' is missing an operand")
        return (parseScalar(ls), parseScalar(rs)) match {
          case (Some(_), Some(_)) =>
            throw PromQLError("Scalar-scalar expressions are not supported")
          case (Some(v), None) =>
            BinCmpQ(op, v, scalarOnLeft = true, bool,
              requireVectorOperand(parse(rs, nowUs), "right"))
          case (None, Some(v)) =>
            BinCmpQ(op, v, scalarOnLeft = false, bool,
              requireVectorOperand(parse(ls, nowUs), "left"))
          case (None, None) =>
            throw PromQLError(
              "vector-vector comparisons are not supported — compare " +
                "against a scalar")
        }
      case None => ()
    }
    topLevelOp(s) match {
      case Some((i, opLen, op)) =>
        val (ls, rs) = (s.substring(0, i).trim, s.substring(i + opLen).trim)
        if (ls.isEmpty || rs.isEmpty)
          throw PromQLError(s"Binary operator '$op' is missing an operand")
        return (parseScalar(ls), parseScalar(rs)) match {
          case (Some(_), Some(_)) =>
            throw PromQLError("Scalar-scalar expressions are not supported")
          case (Some(v), None) =>
            BinScalarQ(op, v, scalarOnLeft = true,
              requireVectorOperand(parse(rs, nowUs), "right"))
          case (None, Some(v)) =>
            BinScalarQ(op, v, scalarOnLeft = false,
              requireVectorOperand(parse(ls, nowUs), "left"))
          case (None, None) =>
            // optional matching modifier between the operator and the
            // right operand: on(l1,...) or ignoring(l1,...), optionally
            // followed by group_left/group_right (many-to-one matching)
            val ModRe = """(?s)^(on|ignoring)\s*\((.*?)\)\s*(.*)$""".r
            val (matchOn, ignoring, rs1) = rs match {
              case ModRe(kind, ls0, rest) =>
                (ls0.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
                  kind == "ignoring", rest)
              case _ => (Seq.empty[String], false, rs)
            }
            // bare `group_left expr`, or `group_left(l1, l2) expr`
            // with labels to copy from the "one" side onto the output
            val GroupParenRe =
              """(?s)^group_(left|right)\s*\(([^)]*)\)\s*(.*)$""".r
            val GroupRe = """(?s)^group_(left|right)\s+(.*)$""".r
            val (grouping, groupCopy, rs2) = rs1 match {
              case GroupParenRe(side, ls0, rest) =>
                (Some(side),
                  ls0.split(",").map(_.trim).filter(_.nonEmpty).toSeq, rest)
              case GroupRe(side, rest) => (Some(side), Seq.empty[String], rest)
              case _ => (None, Seq.empty[String], rs1)
            }
            if (rs2.isEmpty)
              throw PromQLError(s"Binary operator '$op' is missing an operand")
            val lq = parse(ls, nowUs)
            val rq = parse(rs2, nowUs)
            val plainMatch = matchOn.isEmpty && !ignoring && grouping.isEmpty
            (lq, rq) match {
              // a scalar() operand turns the vector op into dynamic-
              // scalar arithmetic (matching modifiers don't apply to a
              // scalar side, so they force the vector-vector path and
              // its operand validation)
              case (sq: ScalarQ, _) if plainMatch =>
                BinDynScalarQ(op, sq, scalarOnLeft = true,
                  requireVectorOperand(rq, "right"))
              case (_, sq: ScalarQ) if plainMatch =>
                BinDynScalarQ(op, sq, scalarOnLeft = false,
                  requireVectorOperand(lq, "left"))
              case _ =>
                BinVectorQ(op,
                  requireVectorOperand(lq, "left"),
                  requireVectorOperand(rq, "right"),
                  matchOn, ignoring, grouping, groupCopy)
            }
        }
      case None => ()
    }
    val headRe = """^([a-zA-Z_:][a-zA-Z0-9_:]*)""".r
    headRe.findPrefixMatchOf(s) match {
      case Some(m) =>
        val head = m.matched
        val after = s.substring(head.length)
        if (UnsupportedFns.contains(head) && after.trim.startsWith("("))
          throw PromQLError(
            s"$head is not supported: ${UnsupportedFns(head)}")
        if (head == "label_replace" || head == "label_join") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val args = splitArgs(inner)
          def str(a: String, what: String): String = {
            val t = a.trim
            if (t.length < 2 || t.head != '"' || t.last != '"')
              throw PromQLError(s"$head expects a quoted string for $what")
            t.substring(1, t.length - 1)
          }
          val vec = requireVectorOperand(
            parse(args.headOption.getOrElse(
              throw PromQLError(s"$head expects a vector first argument")),
              nowUs), "vector")
          if (head == "label_replace") {
            if (args.length != 5)
              throw PromQLError(
                "label_replace expects (vec, dst, replacement, src, regex)")
            LabelReplaceQ(str(args(1), "dst"), str(args(2), "replacement"),
              str(args(3), "src"), str(args(4), "regex"), vec)
          } else {
            if (args.length < 3)
              throw PromQLError(
                "label_join expects (vec, dst, sep, src...)")
            LabelJoinQ(str(args(1), "dst"), str(args(2), "sep"),
              args.drop(3).map(str(_, "src label")), vec)
          }
        } else if (head == "count_values") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val ArgRe = """(?s)^\s*"([^"]*)"\s*,\s*(.*)$""".r
          inner match {
            case ArgRe(label, selStr) =>
              if (selStr.contains("["))
                throw PromQLError(
                  "count_values aggregates an instant vector")
              val sel = parseSelector(selStr, nowUs)
              CountValuesQ(label, sel.matchers, sel.startUs, sel.endUs)
            case _ =>
              throw PromQLError("count_values expects (\"label\", selector)")
          }
        } else if (head == "vector" && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          VectorLitQ(parseScalar(inner.trim).getOrElse(throw PromQLError(
            s"vector() expects a scalar literal, got '${inner.trim}'")))
        } else if (head == "scalar" && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          parse(inner, nowUs) match {
            case _: ScalarQ => throw PromQLError(
              "scalar() expects an instant vector, not another scalar()")
            case q => ScalarQ(q)
          }
        } else if (head == "absent") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val sel = parseSelector(inner, nowUs)
          AbsentQ(sel.matchers, sel.startUs, sel.endUs)
        } else if (head == "histogram_quantile") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val comma = inner.indexOf(',')
          if (comma < 0)
            throw PromQLError("histogram_quantile expects (φ, selector)")
          val phi =
            try inner.substring(0, comma).trim.toDouble
            catch { case _: NumberFormatException =>
              throw PromQLError(
                s"Bad quantile value '${inner.substring(0, comma).trim}'")
            }
          if (phi < 0.0 || phi > 1.0)
            throw PromQLError(s"Quantile $phi out of [0, 1]")
          val selStr = inner.substring(comma + 1).trim
          if (selStr.contains("["))
            throw PromQLError(
              "histogram_quantile aggregates an instant vector of buckets")
          val sel = parseSelector(selStr, nowUs)
          HistogramQuantileQ(phi, sel.matchers, sel.startUs, sel.endUs)
        } else if (head == "topk" || head == "bottomk") {
          // optional `by (labels)` / `without (labels)` clause before or
          // after the body: per-group ranking instead of a global one
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
          var restC = rest0.trim
          if (!haveClause &&
              (restC.startsWith("by") || restC.startsWith("without"))) {
            without = restC.startsWith("without")
            val (ls, r2) = parenGroup(
              restC.stripPrefix(if (without) "without" else "by").trim, s)
            by = ls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            restC = r2.trim
          }
          val rest = restC
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val comma = inner.indexOf(',')
          if (comma < 0)
            throw PromQLError(s"$head expects (k, selector)")
          val k =
            try inner.substring(0, comma).trim.toInt
            catch { case _: NumberFormatException =>
              throw PromQLError(s"Bad k value '${inner.substring(0, comma).trim}'")
            }
          if (k < 1) throw PromQLError(s"$head needs k >= 1, got $k")
          val selStr = inner.substring(comma + 1).trim
          if (selStr.contains("["))
            throw PromQLError(
              s"$head ranks an instant vector, not a range selector")
          val sel = parseSelector(selStr, nowUs)
          TopKQ(head, k, by, without, sel.matchers, sel.startUs,
            sel.endUs)
        } else if (head == "limitk" || head == "limit_ratio") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val comma = inner.indexOf(',')
          if (comma < 0)
            throw PromQLError(s"$head expects (${
              if (head == "limitk") "k" else "ratio"}, selector)")
          val argStr = inner.substring(0, comma).trim
          val selStr = inner.substring(comma + 1).trim
          if (selStr.contains("["))
            throw PromQLError(
              s"$head samples an instant vector, not a range selector")
          val sel = parseSelector(selStr, nowUs)
          if (head == "limitk") {
            val k =
              try argStr.toInt
              catch { case _: NumberFormatException =>
                throw PromQLError(s"Bad k value '$argStr'")
              }
            if (k < 1) throw PromQLError(s"limitk needs k >= 1, got $k")
            LimitKQ(k, sel.matchers, sel.startUs, sel.endUs)
          } else {
            val r =
              try argStr.toDouble
              catch { case _: NumberFormatException =>
                throw PromQLError(s"Bad ratio value '$argStr'")
              }
            if (r < -1.0 || r > 1.0)
              throw PromQLError(s"limit_ratio $r out of [-1, 1]")
            LimitRatioQ(r, sel.matchers, sel.startUs, sel.endUs)
          }
        } else if (head == "quantile_over_time") {
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
          parseSubquery("quantile", Some(phi), selStr, nowUs).getOrElse {
            if (!selStr.contains("["))
              throw PromQLError(
                "quantile_over_time expects a range selector (like metric[5m])")
            val sel = parseSelector(selStr, nowUs)
            QuantileOverTimeQ(phi, sel.matchers, sel.startUs, sel.endUs)
          }
        } else if (head == "mad_over_time") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          parseSubquery("mad", None, inner, nowUs).getOrElse {
            if (!inner.contains("["))
              throw PromQLError(
                "mad_over_time expects a range selector (like metric[5m])")
            val sel = parseSelector(inner, nowUs)
            MadOverTimeQ(sel.matchers, sel.startUs, sel.endUs)
          }
        } else if (head == "predict_linear") {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val args = splitArgs(inner)
          if (args.length != 2)
            throw PromQLError(
              "predict_linear expects (metric[range], t_seconds)")
          val horizon = parseScalar(args(1)).getOrElse(
            throw PromQLError(
              s"predict_linear expects a scalar horizon, got '${args(1)}'"))
          if (!args.head.contains("["))
            throw PromQLError(
              "predict_linear expects a range selector (like metric[5m])")
          val sel = parseSelector(args.head, nowUs)
          PredictLinearQ(horizon, sel.matchers, sel.startUs, sel.endUs)
        } else if (head == "holt_winters" ||
            head == "double_exponential_smoothing") {
          // Prometheus 3 renamed holt_winters (it is double exponential
          // smoothing, not the seasonal Holt-Winters); accept both
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val args = splitArgs(inner)
          if (args.length != 3)
            throw PromQLError(
              "holt_winters expects (metric[range], sf, tf)")
          def factor(a: String, what: String): Double = {
            val v = parseScalar(a).getOrElse(throw PromQLError(
              s"holt_winters expects a scalar $what, got '$a'"))
            if (!(v > 0.0 && v < 1.0))
              throw PromQLError(
                s"holt_winters $what must be in (0, 1), got '$a'")
            v
          }
          val sfp = factor(args(1), "smoothing factor")
          val tfp = factor(args(2), "trend factor")
          val sel = parseSelector(args.head, nowUs)
          if (!sel.hadRange)
            throw PromQLError(
              "holt_winters expects a range selector (like metric[5m])")
          HoltWintersQ(sfp, tfp, sel.matchers, sel.startUs, sel.endUs)
        } else if (head == "timestamp" && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val sel = parseSelector(inner, nowUs)
          if (sel.hadRange)
            throw PromQLError("timestamp expects an instant vector")
          TimestampQ(sel.matchers, sel.startUs, sel.endUs)
        } else if ((head == "sort_by_label" || head == "sort_by_label_desc")
            && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val args = splitArgs(inner)
          if (args.length < 2)
            throw PromQLError(s"$head expects (vec, \"label\", ...)")
          val QuotedRe = """^"([^"]*)"$""".r
          val labelNames = args.tail.map(_.trim).map {
            case QuotedRe(l) => l
            case other =>
              throw PromQLError(s"$head expects quoted label names, got '$other'")
          }
          SortByLabelQ(head.endsWith("_desc"), labelNames,
            requireVectorOperand(parse(args.head, nowUs), "sorted"))
        } else if ((head == "sort" || head == "sort_desc") &&
            after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          SortQ(head == "sort_desc",
            requireVectorOperand(parse(inner, nowUs), "sorted"))
        } else if (head == "absent_over_time") {
          // absent(sel) over a range window — AbsentQ's machinery with
          // the window taken from the range selector
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          if (!inner.contains("["))
            throw PromQLError(
              "absent_over_time expects a range selector (like metric[5m])")
          val sel = parseSelector(inner, nowUs)
          AbsentQ(sel.matchers, sel.startUs, sel.endUs)
        } else if (head.endsWith("_over_time")) {
          val op = head.stripSuffix("_over_time")
          if (!OverTimeOps.contains(op))
            throw PromQLError(s"Unsupported function: $head")
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          parseSubquery(op, None, inner, nowUs).getOrElse {
            if (!inner.contains("["))
              throw PromQLError(
                s"$head expects a range selector (like metric[5m])")
            val sel = parseSelector(inner, nowUs)
            OverTimeQ(op, sel.matchers, sel.startUs, sel.endUs)
          }
        } else if (RangeFnOps.contains(head) && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          if (!inner.contains("["))
            throw PromQLError(
              s"$head expects a range selector (like metric[5m])")
          val sel = parseSelector(inner, nowUs)
          RangeFnQ(head, sel.matchers, sel.startUs, sel.endUs)
        } else if (MathFnArity.contains(head) && after.trim.startsWith("(")) {
          val (inner, rest) = parenGroup(after.trim, s)
          if (rest.trim.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val args = splitArgs(inner)
          if (args.isEmpty)
            throw PromQLError(s"$head expects a vector first argument")
          val arity = MathFnArity(head)
          val scalars = args.tail.map(a => parseScalar(a).getOrElse(
            throw PromQLError(s"$head expects scalar arguments, got '$a'")))
          if (!arity.contains(scalars.length))
            throw PromQLError(s"$head expects ${arity.min}" +
              (if (arity.min == arity.max) "" else s"..${arity.max}") +
              s" scalar argument(s) after the vector, got ${scalars.length}")
          if (head == "round" && scalars.headOption.exists(_ <= 0.0))
            throw PromQLError("round step must be positive")
          MathFnQ(head, scalars,
            requireVectorOperand(parse(args.head, nowUs), "vector"))
        } else if (head == "quantile") {
          // `quantile [by|without (...)] (φ, vec)` — same clause
          // placement rules as the other instant aggregations
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
          if (!haveClause &&
              (rest.startsWith("by") || rest.startsWith("without"))) {
            without = rest.startsWith("without")
            val (ls, r2) = parenGroup(
              rest.stripPrefix(if (without) "without" else "by").trim, s)
            by = ls.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            rest = r2.trim
          }
          if (rest.nonEmpty)
            throw PromQLError(s"Unexpected trailing content in query: '$rest'")
          val comma = inner.indexOf(',')
          if (comma < 0)
            throw PromQLError("quantile expects (φ, vector)")
          val phi =
            try inner.substring(0, comma).trim.toDouble
            catch { case _: NumberFormatException =>
              throw PromQLError(
                s"Bad quantile value '${inner.substring(0, comma).trim}'")
            }
          if (phi < 0.0 || phi > 1.0)
            throw PromQLError(s"Quantile $phi out of [0, 1]")
          val vecStr = inner.substring(comma + 1).trim
          (try Right(parseSelector(vecStr, nowUs))
          catch { case e: PromQLError => Left(e) }) match {
            case Right(sel) if sel.hadRange =>
              throw PromQLError(
                "quantile aggregates an instant vector; use " +
                  "quantile_over_time for range windows")
            case Right(sel) =>
              QuantileAggQ(phi, by, without,
                SelectorQ(sel.matchers, sel.startUs, sel.endUs))
            case Left(selErr) =>
              try QuantileAggQ(phi, by, without,
                requireVectorOperand(parse(vecStr, nowUs), "aggregated"))
              catch {
                case _: PromQLError if selectorShaped(vecStr) => throw selErr
              }
          }
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
          // plain selector -> the classic InstantAggQ; anything else
          // (rate(x[5m]), abs(m), m * 2, nested math) -> aggregation
          // over the per-series vector it evaluates to. A bare RANGE
          // selector (sum(metric[5m])) is invalid PromQL — detected
          // structurally from the selector parse (hadRange), so a regex
          // matcher carrying brackets or parens cannot sneak one past a
          // textual guard
          (try Right(parseSelector(inner, nowUs))
          catch { case e: PromQLError => Left(e) }) match {
            case Right(sel) if sel.hadRange =>
              throw PromQLError(
                s"$head aggregates an instant vector; use " +
                  s"${head}_over_time for range windows")
            case Right(sel) =>
              InstantAggQ(head, by, without,
                sel.matchers, sel.startUs, sel.endUs)
            case Left(selErr) =>
              try InstantAggVecQ(head, by, without,
                requireVectorOperand(parse(inner, nowUs), "aggregated"))
              catch {
                // selector-shaped inner (no function head, no top-level
                // operator to recurse into): the selector's own message
                // names the actual syntax error; the generic fallback
                // error would mask it
                case _: PromQLError if selectorShaped(inner) => throw selErr
              }
          }
        } else {
          val sel = parseSelector(s, nowUs)
          SelectorQ(sel.matchers, sel.startUs, sel.endUs)
        }
      case None =>
        val sel = parseSelector(s, nowUs)
        SelectorQ(sel.matchers, sel.startUs, sel.endUs)
    }
  }

  /** Split a function argument list on top-level commas (outside quotes
    * and all bracket kinds) — selectors like `view{a="1",b="2"}` stay one
    * argument.
    */
  private def splitArgs(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var par = 0; var br = 0; var brace = 0; var inStr = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '(' => par += 1
        case ')' => par -= 1
        case '[' => br += 1
        case ']' => br -= 1
        case '{' => brace += 1
        case '}' => brace -= 1
        case ',' if par == 0 && br == 0 && brace == 0 =>
          out += s.substring(start, i).trim
          start = i + 1
        case _ => ()
      }
      i += 1
    }
    out += s.substring(start).trim
    out.result()
  }

  /** Extract a balanced `(...)` group from the head of `t`; returns
    * (inner, rest).
    */
  private def parenGroup(t: String, whole: String): (String, String) = {
    if (!t.startsWith("("))
      throw PromQLError(s"Failed to parse PromQL query at: '$t'")
    // the closer matching the leading opener is the first depth-0 `)`
    lex(t).find(tok => tok.depth == 0 && tok.kind == PromQLLexer.Punct &&
        tok.text == ")") match {
      case Some(close) =>
        (t.substring(1, close.start), t.substring(close.end))
      case None =>
        throw PromQLError(
          "Failed to parse PromQL query: unbalanced parentheses")
    }
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
    case "present" => max(lit(1.0)) // any sample in the group ⇒ 1
    case "group" => max(lit(1.0))   // Prometheus group(): 1 per group
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
  /** [[eval]] generalized over catalog selection: binary vector queries
    * carry TWO independent matcher sets, so the caller provides the
    * matcher→selected-series mapping instead of one pre-selected frame.
    * Single-selector queries delegate to [[eval]] unchanged.
    */
  def evalWith(
      q: Query,
      selectFor: Seq[LabelMatcher] => DataFrame,
      samples: DataFrame): DataFrame = q match {
    case BinVectorQ(op, left, right, matchOn, ignoring, grouping,
        groupCopy) =>
      // the join key is the canonical (sorted-entries) form of the
      // MATCHING labels: all of them, the on() subset, or everything
      // but the ignoring() subset. Output labels: the matching labels
      // (one-to-one), or the MANY side's full labels under
      // group_left/group_right (many-to-one matching — the "one" side's
      // uniqueness per key is the caller's contract, as in Prometheus)
      val matched =
        (c: Column) => matchingEntries(c, matchOn, ignoring)
      val lv = operandVec(left, selectFor, samples)
        .select(matched(col("labels")).as("__k"),
          col("labels").as("__ll"), col("value").as("__lv"))
      val rv = operandVec(right, selectFor, samples)
        .select(matched(col("labels")).as("__k"),
          col("labels").as("__rl"), col("value").as("__rv"))
      // many-to-one output labels: the many side's full labels, plus
      // any group_left/right(l1,...) labels copied from the "one" side
      // (copied keys replace same-named keys on the many side, the
      // Prometheus contract); built entry-wise so no duplicate keys
      // ever reach map_from_entries
      def withCopied(many: Column, one: Column): Column =
        copiedLabels(many, one, groupCopy)
      val outLabels = grouping match {
        case Some("left") => withCopied(col("__ll"), col("__rl"))
        case Some("right") => withCopied(col("__rl"), col("__ll"))
        case _ => map_from_entries(col("__k"))
      }
      lv.join(rv, "__k")
        .select(outLabels.as("labels"),
          binCol(op, col("__lv"), col("__rv")).as("value"))
    case BinSetQ(op, left, right) =>
      val canon = (c: Column) => array_sort(map_entries(
        coalesce(c, map().cast("map<string,string>"))))
      val lv = operandVec(left, selectFor, samples)
        .withColumn("__k", canon(col("labels")))
      val rv = operandVec(right, selectFor, samples)
        .withColumn("__k", canon(col("labels")))
      val out = op match {
        case "and" =>
          lv.join(rv.select(col("__k")).distinct(), Seq("__k"), "left_semi")
        case "unless" =>
          lv.join(rv.select(col("__k")).distinct(), Seq("__k"), "left_anti")
        case _ => // or
          lv.unionByName(
            rv.join(lv.select(col("__k")).distinct(), Seq("__k"), "left_anti"))
      }
      out.select("sensor_id", "labels", "value")
    case sq: SubqueryOverTimeQ if hasOwnSelection(sq.inner) =>
      // binary vector/set/dynamic-scalar operands inside the subquery:
      // each leaf selects its own series through selectFor, evaluates
      // per step (one scan pass per operand, broadcast step grid), and
      // the sides compose per (matching-labels, step)
      val steps = stepTimestamps(sq.rangeUs, sq.stepUs, sq.evalEndUs)
      if (steps.isEmpty)
        throw PromQLError("Subquery range contains no step timestamps")
      foldSubquery(
        perStepAny(sq.inner, steps, sq.evalEndUs, selectFor, samples),
        sq.op, sq.phi, Seq("sensor_id"))
        .select("sensor_id", "labels", "value")
    case b: BinDynScalarQ =>
      // the scalar side resolves its own matcher set; its one-row frame
      // broadcasts into a cross join against the vector side — a
      // constant-cost nested-loop broadcast regardless of vector size
      val sc = broadcast(evalWith(b.scalarQ, selectFor, samples)
        .select(col("value").as("__s")))
      val v = operandVec(b.inner, selectFor, samples)
      val expr =
        if (b.scalarOnLeft) binCol(b.op, col("__s"), col("value"))
        else binCol(b.op, col("value"), col("__s"))
      v.crossJoin(sc).withColumn("value", expr).drop("__s")
    case sq: ScalarQ =>
      scalarValueFrame(operandVec(sq.inner, selectFor, samples))
    case v: VectorLitQ => vectorLitFrame(samples.sparkSession, v.value)
    // wrapper nodes recurse STRUCTURALLY so a multi-matcher subtree
    // anywhere underneath (sum(a / b), abs(a - b) > 0.1) still selects
    // each operand's series independently; the per-node column
    // transforms are shared with the single-selection eval path
    case b: BinScalarQ =>
      applyBinScalar(b, operandVec(b.inner, selectFor, samples))
    case m: MathFnQ =>
      applyMathFn(m, operandVec(m.inner, selectFor, samples))
    case b: BinCmpQ =>
      applyBinCmp(b, operandVec(b.inner, selectFor, samples))
    case s: SortQ =>
      applySort(s.desc, operandVec(s.inner, selectFor, samples))
    case s: SortByLabelQ =>
      applySortByLabel(s, operandVec(s.inner, selectFor, samples))
    case a: InstantAggVecQ =>
      applyGroupAgg(aggCol(a.op, col("value")), a.by, a.without,
        operandVec(a.inner, selectFor, samples))
    case qa: QuantileAggQ =>
      applyGroupAgg(percentile(col("value"), lit(qa.phi)), qa.by,
        qa.without, operandVec(qa.inner, selectFor, samples))
    case lr: LabelReplaceQ =>
      applyLabelReplace(lr, operandVec(lr.inner, selectFor, samples))
    case lj: LabelJoinQ =>
      applyLabelJoin(lj, operandVec(lj.inner, selectFor, samples))
    case other => eval(other, selectFor(other.matchers), samples)
  }

  /** The sorted entry array of the MATCHING labels of a binary vector
    * op: all of them, the on() subset, or everything but the ignoring()
    * subset — the join key both sides share.
    */
  private def matchingEntries(
      c: Column, matchOn: Seq[String], ignoring: Boolean): Column = {
    val entries = map_entries(coalesce(c, map().cast("map<string,string>")))
    val kept =
      if (matchOn.isEmpty && !ignoring) entries
      else {
        val keys = array(matchOn.map(lit): _*)
        if (ignoring)
          filter(entries, e => !array_contains(keys, e.getField("key")))
        else
          filter(entries, e => array_contains(keys, e.getField("key")))
      }
    array_sort(kept)
  }

  /** Many-to-one output labels: the many side's full labels with the
    * group_left/right(l1,...) labels copied from the "one" side (copied
    * keys replace same-named keys, the Prometheus contract); built
    * entry-wise so no duplicate keys reach map_from_entries.
    */
  private def copiedLabels(
      many: Column, one: Column, groupCopy: Seq[String]): Column =
    if (groupCopy.isEmpty) many
    else {
      val keys = array(groupCopy.map(lit): _*)
      val kept = filter(map_entries(many),
        e => !array_contains(keys, e.getField("key")))
      val copied = filter(map_entries(one),
        e => array_contains(keys, e.getField("key")))
      map_from_entries(concat(kept, copied))
    }

  /** Evaluate an operand to the NORMALIZED instant-vector shape
    * (sensor_id, labels, value: double): selectors contribute their
    * latest sample per series; everything else evaluates through
    * [[evalWith]] (so nested multi-matcher subtrees keep per-operand
    * selection) and is then reshaped — aggregation results surface
    * their group-label map as the label set with a canonical rendering
    * minted as the series id (deterministic, used only for ordering
    * tie-breaks), ranked vectors drop their rank column.
    */
  private def operandVec(
      q: Query,
      selectFor: Seq[LabelMatcher] => DataFrame,
      samples: DataFrame): DataFrame = q match {
    case v: VectorLitQ => vectorLitFrame(samples.sparkSession, v.value)
    case s: SelectorQ =>
      normalizeVec(sideVector(s, selectFor(s.matchers), samples))
    case other => normalizeVec(evalWith(other, selectFor, samples))
  }

  /** Canonical series id of a label set: the sorted `k=v` rendering —
    * deterministic and injective per label set, so synthetic vectors
    * (aggregation groups) order and tie-break stably.
    */
  private def canonicalSeriesId(labels: Column): Column =
    concat_ws(",", transform(
      array_sort(map_entries(coalesce(labels,
        map().cast("map<string,string>")))),
      e => concat(e.getField("key"), lit("="), e.getField("value"))))

  /** Reshape any evaluated vector frame to (sensor_id, labels, value:
    * double): aggregations rename group_labels → labels and mint a
    * canonical sensor_id; extra columns (rank) drop.
    */
  private def normalizeVec(df: DataFrame): DataFrame = {
    val labeled =
      if (df.columns.contains("labels")) df
      else df.withColumnRenamed("group_labels", "labels")
    val withId =
      if (labeled.columns.contains("sensor_id")) labeled
      else labeled.withColumn("sensor_id", canonicalSeriesId(col("labels")))
    withId.select(col("sensor_id"), col("labels"),
      col("value").cast("double").as("value"))
  }

  /** One-row/one-series literal vector: empty label set, constant
    * value — the shape `vector(s)` evaluates to.
    */
  private def vectorLitFrame(
      spark: org.apache.spark.sql.SparkSession, v: Double): DataFrame =
    spark.range(1).select(
      lit("").as("sensor_id"),
      map().cast("map<string,string>").as("labels"),
      lit(v).cast("double").as("value"))

  /** Collapse an evaluated vector to PromQL's `scalar()`: one unlabeled
    * row carrying the single element's value, NaN when the vector has
    * zero or more than one element. A global one-row aggregate —
    * constant output at any scale.
    */
  private def scalarValueFrame(vec: DataFrame): DataFrame =
    vec.agg(
      when(count(lit(1)) === 1, first(col("value")))
        .otherwise(lit(Double.NaN)).as("value"))
      .select(lit("").as("sensor_id"),
        map().cast("map<string,string>").as("labels"),
        col("value").cast("double").as("value"))

  private def binCol(op: Char, l: Column, r: Column): Column = op match {
    case '+' => l + r
    case '-' => l - r
    case '*' => l * r
    case '/' => l / r
    // float mod, sign follows the dividend (Go math.Mod = Java %)
    case '%' => l % r
    case '^' => pow(l, r)
    case 'A' => atan2(l, r) // the `atan2` word operator
    case other => throw PromQLError(s"Unsupported binary operator: $other")
  }

  /** Per-value math column (see [[MathFnQ]] for the float-semantics
    * contract). All codegen'd built-ins — no UDFs.
    */
  private def mathCol(fn: String, args: Seq[Double], v: Column): Column =
    fn match {
      case "abs" => abs(v)
      case "ceil" => ceil(v).cast("double")
      case "floor" => floor(v).cast("double")
      case "sqrt" => sqrt(v) // Spark: NaN below zero, same as Prometheus
      case "exp" => exp(v)
      // Spark's log family returns null outside the domain; Prometheus
      // wants -Inf at 0 and NaN below — spell the branches out
      case "ln" => logWithDomain(log(v), v)
      case "log2" => logWithDomain(log2(v), v)
      case "log10" => logWithDomain(log10(v), v)
      case "sgn" => signum(v)
      // trig family: IEEE semantics carry through (asin/acos outside
      // [-1,1] give NaN in both Spark and Go)
      case "sin" => sin(v)
      case "cos" => cos(v)
      case "tan" => tan(v)
      case "asin" => asin(v)
      case "acos" => acos(v)
      case "atan" => atan(v)
      case "sinh" => sinh(v)
      case "cosh" => cosh(v)
      case "tanh" => tanh(v)
      case "deg" => degrees(v)
      case "rad" => radians(v)
      case "round" =>
        val to = args.headOption.getOrElse(1.0)
        floor(v / lit(to) + lit(0.5)).cast("double") * lit(to)
      case "clamp_min" => greatest(v, lit(args.head))
      case "clamp_max" => least(v, lit(args.head))
      case "clamp" =>
        if (args.head > args(1)) lit(Double.NaN)
        else least(greatest(v, lit(args.head)), lit(args(1)))
      // time functions: value = epoch seconds, truncated toward zero
      // exactly like Prometheus's int64(t) cast, fields in UTC (the
      // session timezone GraftSession pins). day_of_week is Sunday=0.
      case "minute" => minute(tsOf(v)).cast("double")
      case "hour" => hour(tsOf(v)).cast("double")
      case "day_of_week" => (dayofweek(tsOf(v)) - 1).cast("double")
      case "day_of_month" => dayofmonth(tsOf(v)).cast("double")
      case "day_of_year" => dayofyear(tsOf(v)).cast("double")
      case "days_in_month" => dayofmonth(last_day(tsOf(v))).cast("double")
      case "month" => month(tsOf(v)).cast("double")
      case "year" => year(tsOf(v)).cast("double")
      case other => throw PromQLError(s"Unsupported math function: $other")
    }

  private def tsOf(epochSeconds: Column): Column =
    // cast, not floor: the int64(t) cast truncates toward zero, so a
    // pre-1970 (negative) epoch second must round up, which floor()
    // would not
    timestamp_seconds(epochSeconds.cast("long"))

  private def logWithDomain(logged: Column, v: Column): Column =
    when(v > 0, logged)
      .when(v === 0, lit(Double.NegativeInfinity))
      .otherwise(lit(Double.NaN))

  /** The label set an aggregation groups on: everything collapses to an
    * empty map without a clause, otherwise the `by` labels (or the
    * complement under `without`).
    */
  /** Deterministic 60-bit draw from a series' label set: md5 of the
    * sorted `k=v` canonical string — membership in limitk/limit_ratio
    * depends only on labels, so it is stable across evals and exactly
    * replayable by any engine with an md5 function.
    */
  private def labelDraw(labels: Column): Column =
    conv(substring(md5(concat_ws(",",
      transform(array_sort(map_entries(labels)),
        e => concat(e.getField("key"), lit("="), e.getField("value"))))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  private def groupLabelsCol(by: Seq[String], without: Boolean): Column =
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

  private def cmpPred(op: String, l: Column, r: Column): Column = op match {
    case ">" => l > r
    case ">=" => l >= r
    case "<" => l < r
    case "<=" => l <= r
    case "==" => l === r
    case "!=" => l =!= r
    case other => throw PromQLError(s"Unsupported comparison: $other")
  }

  // ---- per-node column transforms over an evaluated vector frame,
  // ---- shared between eval (single selection) and evalWith (structural
  // ---- recursion with per-operand selection)

  private def applyBinScalar(b: BinScalarQ, v: DataFrame): DataFrame = {
    val expr =
      if (b.scalarOnLeft) binCol(b.op, lit(b.scalar), col("value"))
      else binCol(b.op, col("value"), lit(b.scalar))
    v.withColumn("value", expr)
  }

  private def applyMathFn(m: MathFnQ, v: DataFrame): DataFrame =
    v.withColumn("value", mathCol(m.fn, m.args, col("value")))

  private def applyBinCmp(b: BinCmpQ, v: DataFrame): DataFrame = {
    val (l, r) =
      if (b.scalarOnLeft) (lit(b.scalar), col("value"))
      else (col("value"), lit(b.scalar))
    val pred = cmpPred(b.op, l, r)
    if (b.bool) v.withColumn("value", when(pred, 1.0).otherwise(0.0))
    else v.filter(pred)
  }

  private def applySort(desc: Boolean, v: DataFrame): DataFrame = {
    val ord =
      if (desc) Seq(col("value").desc, col("sensor_id").asc)
      else Seq(col("value").asc, col("sensor_id").asc)
    // global rank over the per-SERIES vector: catalog-bounded rows
    // (one per series), the TopKQ shape — never a sample-level sort
    v.withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
      .select("rank", "sensor_id", "labels", "value")
  }

  private def applySortByLabel(q: SortByLabelQ, v: DataFrame): DataFrame = {
    val keys = q.labels.map { l =>
      val k = coalesce(element_at(col("labels"), l), lit(""))
      if (q.desc) k.desc else k.asc
    } :+ (if (q.desc) col("sensor_id").desc else col("sensor_id").asc)
    v.withColumn("rank", row_number().over(Window.orderBy(keys: _*)))
      .select("rank", "sensor_id", "labels", "value")
  }

  private def applyGroupAgg(
      agg: Column, by: Seq[String], without: Boolean,
      v: DataFrame): DataFrame =
    v.withColumn("group_labels", groupLabelsCol(by, without))
      .groupBy(col("group_labels"))
      .agg(agg.as("value"))

  private def applyLabelReplace(lr: LabelReplaceQ, v: DataFrame): DataFrame = {
    // Prometheus: regex must match the WHOLE src value; non-matching
    // series pass through; an empty expansion drops dst. Anchored match
    // + capture expansion run on the linear-time engine
    // (graft.functions.LinearRegex) — user regexes never reach Java's
    // backtracking matcher (ReDoS class; see Matchers.scala scaladoc).
    val srcVal = coalesce(element_at(col("labels"), lr.src), lit(""))
    val expanded = org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.LinearRegexReplaceFullExpression(
        org.apache.spark.sql.GraftSqlShim.expression(srcVal),
        lr.regex, lr.replacement))
    v.withColumn("labels",
      when(expanded.isNotNull,
        labelsWith(lr.dst, expanded)).otherwise(col("labels")))
  }

  private def applyLabelJoin(lj: LabelJoinQ, v: DataFrame): DataFrame = {
    val joined = concat_ws(lj.sep, lj.srcs.map(sl =>
      coalesce(element_at(col("labels"), sl), lit(""))): _*)
    v.withColumn("labels", labelsWith(lj.dst, joined))
  }

  /** Prometheus subquery step alignment: evaluation timestamps are the
    * multiples of `step` (since the Unix epoch) inside
    * `[end − range, end]`.
    */
  private def stepTimestamps(
      rangeUs: Long, stepUs: Long, endUs: Long): Seq[Long] = {
    val start = endUs - rangeUs
    val floor = Math.floorDiv(start, stepUs) * stepUs
    val first = if (floor < start) floor + stepUs else floor
    (first to endUs by stepUs).toList
  }

  /** Evaluate an operand to its instant vector (one row per series:
    * sensor_id, labels, value): a plain selector contributes each
    * series' latest sample in the window; per-series functions
    * contribute their result.
    */
  private def sideVector(
      q: Query, selected: DataFrame, samples: DataFrame): DataFrame =
    q match {
      case s: SelectorQ =>
        lastInWindow(samples
          .filter(col("timestamp_us").between(s.startUs, s.endUs))
          .join(broadcast(selected), "sensor_id"))
          .select("sensor_id", "labels", "value")
      case other => eval(other, selected, samples)
    }

  /** The per-step vector of `inner` over a step grid: one row per
    * (series, step) — (sensor_id, __t, labels, value). ONE pass over
    * the scan: the (tiny) step frame broadcasts into a range join that
    * lands each sample in every step window holding it (≤ span/step + 1
    * steps), then the inner evaluates per (series, step) group — never
    * a per-step job loop. Shared by the subquery *_over_time fold and
    * the query_range API ([[evalRange]]).
    */
  private def perStepVector(
      inner: Query, steps: Seq[Long],
      innerShiftUs: Long, innerSpanUs: Long,
      selected: DataFrame, samples: DataFrame): DataFrame = {
    import samples.sparkSession.implicits._
    val inWindow = samples
      .filter(col("timestamp_us").between(
        steps.min - innerShiftUs - innerSpanUs, steps.max - innerShiftUs))
      .join(broadcast(selected), "sensor_id")
    val stepsDf = steps.toDF("__t")
    val lo = col("__t") - lit(innerShiftUs + innerSpanUs)
    val hi = col("__t") - lit(innerShiftUs)
    val j = inWindow.join(broadcast(stepsDf),
      col("timestamp_us") >= lo && col("timestamp_us") <= hi)
    def grouped = j.groupBy(col("sensor_id"), col("__t"))
    // latest sample in the step window, ties on timestamp resolved by
    // value like lastInWindow's (ts desc, value desc) ordering
    def lastAtStep: DataFrame = grouped
      .agg(first(col("labels")).as("labels"),
        max(struct(col("timestamp_us"), col("value")))
          .getField("value").as("value"))
    // cross-series aggregation at each step: the per-step vector groups
    // by its kept labels, and the group becomes the series the caller
    // keys on (canonical-rendered id)
    def stepAgg(sv: DataFrame, agg: Column, by: Seq[String],
        without: Boolean): DataFrame =
      sv.withColumn("group_labels", groupLabelsCol(by, without))
        .groupBy(col("__t"), col("group_labels"))
        .agg(agg.as("value"))
        .select(canonicalSeriesId(col("group_labels")).as("sensor_id"),
          col("__t"), col("group_labels").as("labels"),
          col("value").cast("double").as("value"))
    def stepValues(q0: Query): DataFrame = q0 match {
      case _: SelectorQ => lastAtStep
      case OverTimeQ("last", _, _, _) => lastAtStep
      case OverTimeQ(op2, _, _, _) =>
        grouped.agg(first(col("labels")).as("labels"),
          aggCol(op2, col("value")).as("value"))
      case QuantileOverTimeQ(phi, _, _, _) =>
        grouped.agg(first(col("labels")).as("labels"),
          percentile(col("value"), lit(phi)).as("value"))
      case RangeFnQ("delta", _, _, _) =>
        grouped.agg(first(col("labels")).as("labels"),
          (max(struct(col("timestamp_us"), col("value")))
            .getField("value") -
            min(struct(col("timestamp_us"), col("value")))
              .getField("value")).as("value"),
          count(lit(1)).as("__n"))
          .filter(col("__n") >= 2)
          .select(col("sensor_id"), col("__t"), col("labels"),
            col("value"))
      case RangeFnQ(op2 @ ("resets" | "changes"), _, _, _) =>
        val ord = Window.partitionBy(col("sensor_id"), col("__t"))
          .orderBy(col("timestamp_us"), col("value"))
        val withPrev =
          j.withColumn("__prev", lag(col("value"), 1).over(ord))
        val ind =
          if (op2 == "resets") col("value") < col("__prev")
          else col("value") =!= col("__prev")
        withPrev.groupBy(col("sensor_id"), col("__t"))
          .agg(first(col("labels")).as("labels"),
            sum(when(col("__prev").isNotNull && ind, 1L)
              .otherwise(0L)).cast("double").as("value"))
      case RangeFnQ(op2 @ ("increase" | "rate"), _, _, _) =>
        val ord = Window.partitionBy(col("sensor_id"), col("__t"))
          .orderBy(col("timestamp_us"), col("value"))
        val d = j.withColumn("__prev", lag(col("value"), 1).over(ord))
          .withColumn("__d",
            when(col("__prev").isNull, lit(null).cast("double"))
              .when(col("value") >= col("__prev"),
                col("value") - col("__prev"))
              .otherwise(col("value")))
        val agg = d.groupBy(col("sensor_id"), col("__t"))
          .agg(first(col("labels")).as("labels"),
            sum(col("__d")).as("value"))
          .filter(col("value").isNotNull)
        if (op2 == "rate")
          agg.withColumn("value",
            col("value") / lit(innerSpanUs / 1e6))
        else agg
      case b: BinScalarQ =>
        val v = stepValues(b.inner)
        val e =
          if (b.scalarOnLeft) binCol(b.op, lit(b.scalar), col("value"))
          else binCol(b.op, col("value"), lit(b.scalar))
        v.withColumn("value", e)
      case a: InstantAggQ =>
        stepAgg(lastAtStep, aggCol(a.op, col("value")), a.by, a.without)
      case a: InstantAggVecQ =>
        stepAgg(stepValues(a.inner), aggCol(a.op, col("value")),
          a.by, a.without)
      case qa: QuantileAggQ =>
        stepAgg(stepValues(qa.inner),
          percentile(col("value"), lit(qa.phi)), qa.by, qa.without)
      case m: MathFnQ =>
        stepValues(m.inner)
          .withColumn("value", mathCol(m.fn, m.args, col("value")))
      case b: BinCmpQ =>
        val v = stepValues(b.inner)
        val (l, r) =
          if (b.scalarOnLeft) (lit(b.scalar), col("value"))
          else (col("value"), lit(b.scalar))
        val pred = cmpPred(b.op, l, r)
        if (b.bool) v.withColumn("value", when(pred, 1.0).otherwise(0.0))
        else v.filter(pred)
      case _ =>
        throw PromQLError("Unsupported subquery inner expression")
    }
    stepValues(inner)
  }

  /** The subquery OUTER fold: `<op>_over_time` across the per-step
    * vector, grouped by `keys` (the series id, plus the outer step for
    * nested subqueries). Shared by the single-selection eval path and
    * [[perStepAny]].
    */
  private def foldSubquery(
      sv: DataFrame, op: String, phi: Option[Double],
      keys: Seq[String]): DataFrame = {
    val ks = keys.map(col)
    (op, phi) match {
      case ("quantile", Some(p)) =>
        sv.groupBy(ks: _*).agg(first(col("labels")).as("labels"),
          percentile(col("value"), lit(p)).as("value"))
      case ("mad", _) =>
        val med = sv.groupBy(ks: _*)
          .agg(percentile(col("value"), lit(0.5)).as("__med"))
        sv.join(med, keys)
          .groupBy(ks: _*)
          .agg(first(col("labels")).as("labels"),
            percentile(abs(col("value") - col("__med")), lit(0.5))
              .as("value"))
      case ("last", _) =>
        sv.groupBy(ks: _*).agg(first(col("labels")).as("labels"),
          max(struct(col("__t"), col("value")))
            .getField("value").as("value"))
      case (op2, _) =>
        sv.groupBy(ks: _*).agg(first(col("labels")).as("labels"),
          aggCol(op2, col("value")).as("value"))
    }
  }

  /** [[perStepVector]] generalized over catalog selection and operand
    * shape: binary vector/set operands evaluate each side independently
    * (each leaf keeps its own ONE-SCAN perStepVector pass with the
    * broadcast step grid) and join per (matching-labels, step); nested
    * subqueries share one epoch-aligned inner grid across all outer
    * steps (inner step timestamps are epoch multiples, so they repeat
    * across outer steps — one inner pass total, joined to the small
    * (outer, inner) pair frame); dynamic scalars resolve per step.
    * Single-selection subtrees delegate to [[perStepVector]] unchanged.
    * Output: (sensor_id, __t, labels, value), one row per (series, step).
    *
    * `refUs` is the parse-time evaluation reference (every node's
    * offset shift is measured against it).
    */
  private def perStepAny(
      q: Query, steps: Seq[Long], refUs: Long,
      selectFor: Seq[LabelMatcher] => DataFrame,
      samples: DataFrame): DataFrame =
    if (!needsPerStepAny(q))
      perStepVector(q, steps, refUs - q.endUs, q.endUs - q.startUs,
        selectFor(q.matchers), samples)
    else q match {
      case b: BinVectorQ =>
        val lv = perStepAny(b.left, steps, refUs, selectFor, samples)
          .select(
            matchingEntries(col("labels"), b.matchOn, b.ignoring).as("__k"),
            col("__t"), col("labels").as("__ll"), col("value").as("__lv"))
        val rv = perStepAny(b.right, steps, refUs, selectFor, samples)
          .select(
            matchingEntries(col("labels"), b.matchOn, b.ignoring).as("__k"),
            col("__t"), col("labels").as("__rl"), col("value").as("__rv"))
        val outLabels = b.grouping match {
          case Some("left") => copiedLabels(col("__ll"), col("__rl"), b.groupCopy)
          case Some("right") => copiedLabels(col("__rl"), col("__ll"), b.groupCopy)
          case _ => map_from_entries(col("__k"))
        }
        lv.join(rv, Seq("__k", "__t"))
          .select(canonicalSeriesId(outLabels).as("sensor_id"), col("__t"),
            outLabels.as("labels"),
            binCol(b.op, col("__lv"), col("__rv")).as("value"))
      case b: BinSetQ =>
        val canon = (c: Column) => array_sort(map_entries(
          coalesce(c, map().cast("map<string,string>"))))
        val lv = perStepAny(b.left, steps, refUs, selectFor, samples)
          .withColumn("__k", canon(col("labels")))
        val rv = perStepAny(b.right, steps, refUs, selectFor, samples)
          .withColumn("__k", canon(col("labels")))
        val out = b.op match {
          case "and" =>
            lv.join(rv.select(col("__k"), col("__t")).distinct(),
              Seq("__k", "__t"), "left_semi")
          case "unless" =>
            lv.join(rv.select(col("__k"), col("__t")).distinct(),
              Seq("__k", "__t"), "left_anti")
          case _ => // or
            lv.unionByName(rv.join(
              lv.select(col("__k"), col("__t")).distinct(),
              Seq("__k", "__t"), "left_anti"))
        }
        out.select("sensor_id", "__t", "labels", "value")
      case b: BinDynScalarQ =>
        // scalar(x) per step: the single series' value when the step's
        // vector has exactly one element, NaN otherwise (Prometheus);
        // steps with an EMPTY vector surface NaN via the left join
        val scv = perStepAny(b.scalarQ.inner, steps, refUs, selectFor,
          samples)
        val sc = scv.groupBy(col("__t"))
          .agg(when(count(lit(1)) === 1, min(col("value")))
            .otherwise(lit(Double.NaN)).as("__s"))
        val v = perStepAny(b.inner, steps, refUs, selectFor, samples)
        val s = coalesce(col("__s"), lit(Double.NaN))
        val e =
          if (b.scalarOnLeft) binCol(b.op, s, col("value"))
          else binCol(b.op, col("value"), s)
        v.join(broadcast(sc), Seq("__t"), "left")
          .withColumn("value", e).drop("__s")
      case v: VectorLitQ =>
        import samples.sparkSession.implicits._
        val empty = map().cast("map<string,string>")
        steps.toDF("__t").select(
          canonicalSeriesId(empty).as("sensor_id"), col("__t"),
          empty.as("labels"), lit(v.value).as("value"))
      case sq: SubqueryOverTimeQ =>
        // nested subquery: for each outer step t the inner evaluates on
        // its own grid ending at t — but inner steps are epoch-aligned
        // multiples, so the DISTINCT inner timestamps across all outer
        // steps form ONE shared grid: a single inner pass, fanned out
        // to (outer, inner) pairs by a broadcast join, folded per
        // (series, outer step)
        val pairs = steps.flatMap(t =>
          stepTimestamps(sq.rangeUs, sq.stepUs, t).map(it => (t, it)))
        if (pairs.isEmpty)
          throw PromQLError("Subquery range contains no step timestamps")
        val innerTs = pairs.map(_._2).distinct.sorted
        val sv = perStepAny(sq.inner, innerTs, refUs, selectFor, samples)
        import samples.sparkSession.implicits._
        val pairDf = broadcast(pairs.toDF("__ot", "__t"))
        foldSubquery(sv.join(pairDf, "__t"), sq.op, sq.phi,
          Seq("sensor_id", "__ot"))
          .select(col("sensor_id"), col("__ot").as("__t"), col("labels"),
            col("value"))
      case b: BinScalarQ =>
        val v = perStepAny(b.inner, steps, refUs, selectFor, samples)
        val e =
          if (b.scalarOnLeft) binCol(b.op, lit(b.scalar), col("value"))
          else binCol(b.op, col("value"), lit(b.scalar))
        v.withColumn("value", e)
      case m: MathFnQ =>
        perStepAny(m.inner, steps, refUs, selectFor, samples)
          .withColumn("value", mathCol(m.fn, m.args, col("value")))
      case b: BinCmpQ =>
        val v = perStepAny(b.inner, steps, refUs, selectFor, samples)
        val (l, r) =
          if (b.scalarOnLeft) (lit(b.scalar), col("value"))
          else (col("value"), lit(b.scalar))
        val pred = cmpPred(b.op, l, r)
        if (b.bool) v.withColumn("value", when(pred, 1.0).otherwise(0.0))
        else v.filter(pred)
      case a: InstantAggVecQ =>
        stepAggVec(perStepAny(a.inner, steps, refUs, selectFor, samples),
          aggCol(a.op, col("value")), a.by, a.without)
      case qa: QuantileAggQ =>
        stepAggVec(perStepAny(qa.inner, steps, refUs, selectFor, samples),
          percentile(col("value"), lit(qa.phi)), qa.by, qa.without)
      case other =>
        throw PromQLError("Unsupported subquery inner expression")
    }

  /** Cross-series aggregation of a per-step vector at each step: the
    * aggregate's group labels become the series identity.
    */
  private def stepAggVec(sv: DataFrame, agg: Column, by: Seq[String],
      without: Boolean): DataFrame =
    sv.withColumn("group_labels", groupLabelsCol(by, without))
      .groupBy(col("__t"), col("group_labels"))
      .agg(agg.as("value"))
      .select(canonicalSeriesId(col("group_labels")).as("sensor_id"),
        col("__t"), col("group_labels").as("labels"),
        col("value").cast("double").as("value"))

  /** Prometheus range-query evaluation (`query_range`): the expression
    * at every step in `[startUs, endUs]` anchored at `startUs` (start,
    * start+step, …, ≤ end — the Prometheus API grid, unlike subquery
    * steps which align to epoch multiples), one row per (series, step):
    * (sensor_id, labels, t_us, value). Supported expressions are the
    * subquery-valid shapes — selectors (latest sample in the lookback
    * ending at the step), per-series range functions over their
    * bracketed window, scalar arithmetic/comparison/math wrappers, and
    * cross-series aggregations over any of them. Parse the query with
    * `nowUs = endUs` so selector windows and `offset` resolve against
    * the range end (the 3-arg [[parse]] overload also resolves
    * `@ start()` / `@ end()` anchors).
    */
  def evalRange(
      q: Query, startUs: Long, endUs: Long, stepUs: Long,
      selectFor: Seq[LabelMatcher] => DataFrame,
      samples: DataFrame): DataFrame = {
    rangeChecks(q, startUs, endUs, stepUs)
    val steps = (startUs to endUs by stepUs).toList
    // binary vector/set/dynamic-scalar expressions and subqueries route
    // through perStepAny (each leaf one scan pass; sides joined per
    // (matching-labels, step)) — `errors / requests` charted at every
    // step is the dashboard ratio panel
    val sv =
      if (needsPerStepAny(q)) perStepAny(q, steps, endUs, selectFor, samples)
      else perStepVector(q, steps, endUs - q.endUs, q.endUs - q.startUs,
        selectFor(q.matchers), samples)
    sv.select(col("sensor_id"), col("labels"), col("__t").as("t_us"),
        col("value").cast("double").as("value"))
  }

  private def rangeChecks(
      q: Query, startUs: Long, endUs: Long, stepUs: Long): Unit = {
    if (stepUs <= 0) throw PromQLError("query_range step must be positive")
    if (endUs < startUs)
      throw PromQLError("query_range end precedes start")
    if ((endUs - startUs) / stepUs > 100000L)
      throw PromQLError("query_range resolves to more than 100000 steps")
    if (!validSubqueryInner(q))
      throw PromQLError(
        "query_range supports selectors, per-series functions, scalar " +
          "wrappers, and cross-series aggregations over them")
  }

  /** `@` anywhere outside quoted label values? */
  private def containsAt(s: String): Boolean =
    lex(s).exists(t => t.kind == PromQLLexer.Op && t.text == "@")

  /** The query_range API entry: parses `query`, resolves `@ start()` /
    * `@ end()` anchors against the range bounds, and dispatches:
    *
    *  - no `@` modifier → the per-step path ([[evalRange]]): each step's
    *    window ends at that step (shifted by `offset` if present);
    *  - a trailing top-level `@ T` pinning the WHOLE expression →
    *    Prometheus semantics: evaluate ONCE at the pinned time and
    *    replicate the value across every step (a constant series) —
    *    `metric @ start()` reads the window ending at the range start
    *    at every step, it does NOT drift with the grid;
    *  - `@` on a sub-expression (e.g. `a @ 100 + b`) → clean
    *    PromQLError (documented deviation: per-operand pinning inside a
    *    range grid is not supported).
    *
    * `samplesFor(loUs, hiUs)` supplies the sample scan bounded to the
    * widest window any step (or the pinned instant) reads — bounds
    * computed HERE so callers can't under-scan.
    */
  def evalRangeApi(
      query: String, startUs: Long, endUs: Long, stepUs: Long,
      selectFor: Seq[LabelMatcher] => DataFrame,
      samplesFor: (Long, Long) => DataFrame): DataFrame = {
    val resolved = resolveAtAnchors(query, startUs, endUs)
    if (!containsAt(resolved)) {
      val q = parse(resolved, endUs)
      val shiftUs = endUs - q.endUs
      val spanUs = q.endUs - q.startUs
      return evalRange(q, startUs, endUs, stepUs, selectFor,
        samplesFor(startUs - shiftUs - spanUs, endUs - shiftUs))
    }
    trailingAt(resolved.trim) match {
      case Some((inner, ts)) if !containsAt(inner) =>
        val pinUs = (ts.toDouble * 1e6).toLong
        val q = parse(inner.trim, pinUs)
        rangeChecks(q, startUs, endUs, stepUs)
        val samples = samplesFor(q.startUs, q.endUs)
        // one evaluation at the pinned instant (a single-step grid at
        // the pinned window's end, zero shift) — through perStepAny, so
        // every shape rangeChecks admits (binary-vector operands, nested
        // subqueries, dynamic scalars) pins too, not just the
        // single-selection subtrees perStepVector can one-scan
        val once = perStepAny(q, List(pinUs), pinUs, selectFor, samples)
          .select(col("sensor_id"), col("labels"),
            col("value").cast("double").as("value"))
        // ...replicated across the step grid (tiny grid broadcasts)
        import samples.sparkSession.implicits._
        val steps = (startUs to endUs by stepUs).toList
        once.crossJoin(broadcast(steps.toDF("t_us")))
          .select(col("sensor_id"), col("labels"), col("t_us"),
            col("value"))
      case _ =>
        throw PromQLError(
          "@ modifiers on sub-expressions are not supported in " +
            "query_range; pin the whole expression with a trailing @ " +
            "(e.g. `sum(metric) @ end()`)")
    }
  }

  def eval(q: Query, selected: DataFrame, samples: DataFrame): DataFrame = {
    val inWindow = samples
      .filter(col("timestamp_us").between(q.startUs, q.endUs))
      .join(broadcast(selected), "sensor_id")
    q match {
      case b: BinScalarQ =>
        applyBinScalar(b,
          normalizeVec(sideVector(b.inner, selected, samples)))
      case m: MathFnQ =>
        applyMathFn(m, normalizeVec(sideVector(m.inner, selected, samples)))
      case b: BinCmpQ =>
        applyBinCmp(b, normalizeVec(sideVector(b.inner, selected, samples)))
      case LimitKQ(k, _, _, _) =>
        lastInWindow(inWindow)
          .withColumn("__d", labelDraw(col("labels")))
          .orderBy(col("__d").asc, col("sensor_id").asc)
          .limit(k)
          .select("sensor_id", "labels", "value")
      case LimitRatioQ(r, _, _, _) =>
        val latest = lastInWindow(inWindow)
          .withColumn("__d", labelDraw(col("labels")).cast("double") /
            lit((1L << 60).toDouble))
        val kept =
          // r = 1.0 keeps ALL series: the ~2^-54 of draws that round
          // to exactly 1.0 in double space would fail a bare `< 1.0`
          if (r >= 1.0) lit(true)
          else if (r >= 0) col("__d") < lit(r)
          else col("__d") >= lit(1.0 + r)
        latest.filter(kept).select("sensor_id", "labels", "value")
      case TopKQ(op, k, by, without, _, _, _) =>
        val latest = lastInWindow(inWindow)
        val ord = Seq(
          if (op == "topk") col("value").desc else col("value").asc,
          col("sensor_id").asc)
        if (by.isEmpty && !without) {
          // limit first: TakeOrderedAndProject bounds the sort to k
          // rows; the rank window then runs over k rows, not the full
          // vector
          latest.orderBy(ord: _*).limit(k)
            .withColumn("rank", row_number().over(Window.orderBy(ord: _*)))
            .select("rank", "sensor_id", "labels", "value")
        } else {
          // per-group ranking: the rank-filter shape Spark rewrites to
          // WindowGroupLimit — per-partition top-k, no global sort.
          // Maps are not orderable, so the window partitions on the
          // sorted-entries canonical key of the group labels
          val w = Window.partitionBy(col("__gk")).orderBy(ord: _*)
          latest.withColumn("__gk",
              array_sort(map_entries(groupLabelsCol(by, without))))
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= k)
            .select("rank", "sensor_id", "labels", "value")
        }
      case HoltWintersQ(sfp, tfp, _, _, _) =>
        import samples.sparkSession.implicits._
        // Prometheus's holtWinters fold (promql/functions.go): s seeds
        // with the first sample, the trend with the first delta, and the
        // i=1 step uses the seed trend directly. Inherently sequential —
        // a per-series sorted scan with O(1) state, one shuffle on
        // sensor_id (the storage sort key), exactly the deadband shape.
        inWindow
          .select(col("sensor_id"), col("labels"),
            col("timestamp_us"), col("value"))
          .as[(String, Map[String, String], Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (id, it) =>
            val rows = it.toArray.sortBy(r => (r._3, r._4))(
              Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering))
            if (rows.length < 2) Iterator.empty
            else {
              var s0 = 0.0
              var s1 = rows(0)._4
              var b = rows(1)._4 - rows(0)._4
              var i = 1
              while (i < rows.length) {
                val trend =
                  if (i == 1) b else tfp * (s1 - s0) + (1 - tfp) * b
                val next = sfp * rows(i)._4 + (1 - sfp) * (s1 + trend)
                s0 = s1; s1 = next; b = trend
                i += 1
              }
              Iterator((id, rows(0)._2, s1))
            }
          }
          .toDF("sensor_id", "labels", "value")
      case TimestampQ(_, _, _) =>
        lastInWindow(inWindow)
          .select(col("sensor_id"), col("labels"),
            (col("timestamp_us").cast("double") / lit(1e6)).as("value"))
      case s: SortByLabelQ =>
        applySortByLabel(s,
          normalizeVec(sideVector(s.inner, selected, samples)))
      case SortQ(desc, inner) =>
        applySort(desc, normalizeVec(sideVector(inner, selected, samples)))
      case v: VectorLitQ => vectorLitFrame(samples.sparkSession, v.value)
      case sq: ScalarQ =>
        // sideVector gives the INSTANT vector for a plain selector
        // (latest per series), which is what scalar() consumes
        scalarValueFrame(sideVector(sq.inner, selected, samples))
      case b: BinDynScalarQ =>
        // single-selection variant (nested under a per-series wrapper,
        // or a caller-supplied selection covering both operands)
        val sc = broadcast(eval(b.scalarQ, selected, samples)
          .select(col("value").as("__s")))
        val v = sideVector(b.inner, selected, samples)
        val expr =
          if (b.scalarOnLeft) binCol(b.op, col("__s"), col("value"))
          else binCol(b.op, col("value"), col("__s"))
        v.crossJoin(sc).withColumn("value", expr).drop("__s")
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
      case MadOverTimeQ(_, _, _) =>
        val med = inWindow.groupBy(col("sensor_id"))
          .agg(percentile(col("value"), lit(0.5)).as("__med"))
        inWindow.join(med, "sensor_id")
          .groupBy(col("sensor_id"))
          .agg(first(col("labels")).as("labels"),
            percentile(abs(col("value") - col("__med")), lit(0.5))
              .as("value"))
          .select("sensor_id", "labels", "value")
      case PredictLinearQ(horizonS, _, _, endUs) =>
        // x anchored at the window end, so the prediction at now + t is
        // intercept + slope * t — replayable regression arithmetic
        val x = (col("timestamp_us") - lit(endUs)).cast("double") / lit(1e6)
        inWindow.groupBy(col("sensor_id"))
          .agg(first(col("labels")).as("labels"),
            (regr_intercept(col("value"), x) +
              regr_slope(col("value"), x) * lit(horizonS)).as("value"),
            count(lit(1)).as("__n"))
          .filter(col("__n") >= 2 && col("value").isNotNull)
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
          case "resets" | "changes" =>
            // per-pair indicators summed per series: resets = counter
            // decreases, changes = any value change (Prometheus counts
            // pairs, so singleton series yield 0, empty windows nothing)
            val ind =
              if (op == "resets") col("value") < col("__prev")
              else col("value") =!= col("__prev")
            inWindow
              .withColumn("__prev", lag(col("value"), 1).over(ord))
              .groupBy(col("sensor_id"))
              .agg(first(col("labels")).as("labels"),
                sum(when(col("__prev").isNotNull && ind, 1L)
                  .otherwise(0L)).cast("double").as("value"))
              .select("sensor_id", "labels", "value")
          case "idelta" | "irate" =>
            // the LAST adjacent pair per series: lag rides along into a
            // lexicographic (ts, value) struct max. irate is the
            // instantaneous counter rate over that pair (reset-aware,
            // divided by the pair's own time gap — Prometheus semantics)
            val lastPair = inWindow
              .withColumn("__prev", lag(col("value"), 1).over(ord))
              .withColumn("__prev_ts", lag(col("timestamp_us"), 1).over(ord))
              .groupBy(col("sensor_id"))
              .agg(first(col("labels")).as("labels"),
                max(struct(col("timestamp_us"), col("value"),
                  col("__prev"), col("__prev_ts"))).as("__last"))
              .filter(col("__last.__prev").isNotNull)
            val v = col("__last.value")
            val p = col("__last.__prev")
            val gapS = (col("__last.timestamp_us") - col("__last.__prev_ts"))
              .cast("double") / lit(1e6)
            val e =
              if (op == "idelta") v - p
              else when(v >= p, (v - p) / gapS).otherwise(v / gapS)
            lastPair.select(col("sensor_id"), col("labels"), e.as("value"))
          case "deriv" =>
            // least-squares slope of value over time-in-seconds
            // (Prometheus deriv); x is anchored at the window end so the
            // regression arithmetic is replayable
            val x = (col("timestamp_us") - lit(endUs)).cast("double") /
              lit(1e6)
            inWindow.groupBy(col("sensor_id"))
              .agg(first(col("labels")).as("labels"),
                regr_slope(col("value"), x).as("value"),
                count(lit(1)).as("__n"))
              .filter(col("__n") >= 2 && col("value").isNotNull)
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
      case sq: SubqueryOverTimeQ =>
        if (hasOwnSelection(sq.inner))
          throw PromQLError(
            "subquery operands with their own matcher sets carry " +
              "multiple selections — evaluate via evalWith")
        val steps = stepTimestamps(sq.rangeUs, sq.stepUs, sq.evalEndUs)
        if (steps.isEmpty)
          throw PromQLError("Subquery range contains no step timestamps")
        // single-matcher subtrees (incl. NESTED subqueries) can reuse
        // the caller's pre-selected frame for every leaf
        val sv =
          if (needsPerStepAny(sq.inner))
            perStepAny(sq.inner, steps, sq.evalEndUs, _ => selected,
              samples)
          else perStepVector(sq.inner, steps, sq.innerShiftUs,
            sq.innerSpanUs, selected, samples)
        foldSubquery(sv, sq.op, sq.phi, Seq("sensor_id"))
          .select("sensor_id", "labels", "value")
      case InstantAggQ(op, by, without, _, _, _) =>
        lastInWindow(inWindow)
          .withColumn("group_labels", groupLabelsCol(by, without))
          .groupBy(col("group_labels"))
          .agg(aggCol(op, col("value")).as("value"))
      case a: InstantAggVecQ =>
        applyGroupAgg(aggCol(a.op, col("value")), a.by, a.without,
          normalizeVec(sideVector(a.inner, selected, samples)))
      case qa: QuantileAggQ =>
        applyGroupAgg(percentile(col("value"), lit(qa.phi)), qa.by,
          qa.without, normalizeVec(sideVector(qa.inner, selected, samples)))
      case lr: LabelReplaceQ =>
        applyLabelReplace(lr,
          normalizeVec(sideVector(lr.inner, selected, samples)))
      case lj: LabelJoinQ =>
        applyLabelJoin(lj,
          normalizeVec(sideVector(lj.inner, selected, samples)))
      case HistogramQuantileQ(phi, _, _, _) =>
        // buckets per group = labels minus `le`; arrays are tiny (one
        // entry per bucket boundary), so the interpolation runs as a
        // per-group scalar fold
        val latest = lastInWindow(inWindow)
          .withColumn("__le", element_at(col("labels"), "le"))
          .filter(col("__le").isNotNull)
          .withColumn("group_labels",
            map_from_entries(filter(map_entries(col("labels")),
              e => e.getField("key") =!= "le")))
        latest
          .groupBy(col("group_labels"))
          .agg(collect_list(struct(col("__le").as("le"),
            col("value").as("cum"))).as("__bs"))
          .select(col("group_labels"),
            histInterp(col("__bs"), lit(phi)).as("value"))
          .filter(col("value").isNotNull)
      case CountValuesQ(label, _, _, _) =>
        // Prometheus count_values: one output series per distinct latest
        // value, keyed by a fresh label carrying the value's string form
        lastInWindow(inWindow)
          .groupBy(col("value").as("__v"))
          .agg(count(lit(1)).as("__n"))
          .select(map(lit(label), col("__v").cast("string"))
            .as("group_labels"), col("__n").as("value"))
      case AbsentQ(_, _, _) =>
        // lazy: a global count that keeps its row only when zero — no
        // Spark job runs at plan-construction time (eval stays a pure
        // plan builder on every branch)
        inWindow.agg(count(lit(1)).as("__n"))
          .filter(col("__n") === 0)
          .select(map().cast("map<string,string>").as("labels"),
            lit(1.0).as("value"))
      case _: BinVectorQ | _: BinSetQ =>
        throw PromQLError(
          "binary vector queries carry two matcher sets — evaluate via evalWith")
    }
  }

  /** Prometheus bucket interpolation: sort buckets by `le` ("+Inf" →
    * ∞), rank = φ·total, walk to the covering bucket, interpolate
    * `lo + (hi − lo)·(rank − cumPrev)/(cum − cumPrev)` (mul before div,
    * the order an external SQL replay also produces). First bucket's
    * lower bound is 0; an infinite covering bucket yields the highest
    * finite `le`; total ≤ 0 or unparsable input yields null.
    */
  private val histInterp = udf {
    (bs: Seq[org.apache.spark.sql.Row], phi: Double) =>
      def parseLe(s: String): Option[Double] =
        if (s == "+Inf" || s == "inf" || s == "Inf")
          Some(Double.PositiveInfinity)
        else s.toDoubleOption
      val les = bs.map(r => parseLe(r.getString(0)).map((_, r.getDouble(1))))
      // unparsable le, no finite bucket, or zero total ⇒ null (dropped)
      if (les.exists(_.isEmpty)) null.asInstanceOf[java.lang.Double]
      else {
        val parsed = les.flatten.sortBy(_._1)
        if (parsed.isEmpty || !parsed.head._1.isFinite)
          null.asInstanceOf[java.lang.Double]
        else {
          val total = parsed.last._2
          if (total <= 0.0) null.asInstanceOf[java.lang.Double]
          else {
            val rank = phi * total
            var prevLe = 0.0
            var prevCum = 0.0
            var res: java.lang.Double = null
            var i = 0
            while (i < parsed.length && res == null) {
              val (le, cum) = parsed(i)
              if (cum >= rank) {
                res =
                  if (le.isPosInfinity) prevLe
                  else prevLe + (le - prevLe) * (rank - prevCum) / (cum - prevCum)
              } else { prevLe = le; prevCum = cum }
              i += 1
            }
            res
          }
        }
      }
  }

  /** Labels map with `dst` set to `value` — or removed when `value` is
    * the empty string (Prometheus's empty-label-means-absent rule).
    */
  private def labelsWith(dst: String, value: Column): Column = {
    val without = map_from_entries(filter(
      map_entries(coalesce(col("labels"), map().cast("map<string,string>"))),
      e => e.getField("key") =!= dst))
    when(value === "", without)
      .otherwise(map_concat(without, map(lit(dst), value)))
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

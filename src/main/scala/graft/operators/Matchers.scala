package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.SensorType

/** Prometheus-style label matchers (`=`, `!=`, `=~`, `!~`), AND-combined.
  *
  * Semantics (reference: src/storage/query.rs:12-35, truth table enforced
  * in-process at src/ingestors/http/crud.rs:145-182):
  *  - `=` / `=~` do NOT match a sensor lacking the label;
  *  - `!=` / `!~` DO match a sensor lacking the label;
  *  - `__name__` addresses the sensor name (always present);
  *  - an empty matcher set selects nothing
  *    (reference: src/storage/sqlite/storage.rs:437-440).
  *
  * Regexes are unanchored-search (Java regex `find()` via `rlike`), the
  * same tested surface as the reference's Rust-regex SQLite path
  * (reference: tests/query_sensors_by_labels.rs:812-884).
  *
  * KNOWN DEVIATION (engine, not semantics): the reference's Rust regex
  * crate is linear-time; Java's regex engine BACKTRACKS, so a
  * pathological user pattern (nested quantifiers like `(a+)+b`) can
  * cost time exponential in the matched VALUE's length. Catalog label
  * values are short (bounding the blowup) and the gateway's handler
  * timeout answers the client regardless, but a linear-time engine
  * dropped in behind this predicate would remove the class entirely —
  * the patterns the reference's own tests exercise (RE2 ∩ Java, no
  * backrefs/lookarounds) replay identically on both.
  */
sealed trait LabelMatcher {
  def key: String
  def value: String
}
object LabelMatcher {
  final case class Eq(key: String, value: String) extends LabelMatcher
  final case class NotEq(key: String, value: String) extends LabelMatcher
  final case class Re(key: String, value: String) extends LabelMatcher
  final case class NotRe(key: String, value: String) extends LabelMatcher

  val NameLabel = "__name__"

  def eq_(k: String, v: String): LabelMatcher = Eq(k, v)
  def neq(k: String, v: String): LabelMatcher = NotEq(k, v)
  def regex(k: String, v: String): LabelMatcher = Re(k, v)
  def notRegex(k: String, v: String): LabelMatcher = NotRe(k, v)
}

object Matchers {
  import LabelMatcher._

  /** Compile one matcher into a Column predicate over a sensors DataFrame
    * with `name: String` and `labels: Map[String, String]` columns.
    */
  def matcherPredicate(m: LabelMatcher): Column = {
    val isName = m.key == NameLabel
    val v: Column = if (isName) col("name") else col("labels").getItem(m.key)
    m match {
      case Eq(_, x)    => coalesce(v === x, lit(false))
      case NotEq(_, x) => coalesce(v =!= x, lit(true))
      case Re(_, p)    => coalesce(v.rlike(p), lit(false))
      case NotRe(_, p) => coalesce(!v.rlike(p), lit(true))
    }
  }

  /** AND of all matchers; empty matcher set selects nothing. */
  def predicate(ms: Seq[LabelMatcher]): Column =
    if (ms.isEmpty) lit(false)
    else ms.map(matcherPredicate).reduce(_ && _)

  /** Sensor-catalog selection by matchers, optionally restricted to numeric
    * types (Prometheus compatibility,
    * reference: src/storage/sqlite/matchers.rs:48-50). Result ordered by
    * sensor uuid (reference: src/storage/sqlite/matchers.rs:161).
    */
  def sensorsByLabels(
      sensors: DataFrame,
      ms: Seq[LabelMatcher],
      numericOnly: Boolean = false): DataFrame = {
    val base = sensors.filter(predicate(ms))
    val typed =
      if (numericOnly)
        base.filter(col("type").isin(SensorType.numericTypes.map(_.displayName): _*))
      else base
    typed.orderBy("uuid")
  }

  /** Plain-Scala evaluation of the same truth table, for edge-side checks
    * (reference: src/ingestors/http/crud.rs:145-182).
    */
  def matches(
      name: String,
      labels: Map[String, String],
      ms: Seq[LabelMatcher]): Boolean =
    ms.nonEmpty && ms.forall { m =>
      val v: Option[String] =
        if (m.key == NameLabel) Some(name) else labels.get(m.key)
      m match {
        case Eq(_, x)    => v.contains(x)
        case NotEq(_, x) => !v.contains(x)
        case Re(_, p)    => v.exists(s => p.r.findFirstIn(s).isDefined)
        case NotRe(_, p) => !v.exists(s => p.r.findFirstIn(s).isDefined)
      }
    }
}

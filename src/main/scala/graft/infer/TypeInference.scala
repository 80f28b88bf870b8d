package graft.infer

import java.time.LocalDate

/** CSV type-inference lattice (reference: src/infer/parsing.rs,
  * src/infer/columns.rs). A driver-side sampling pass — the inference runs
  * over at most `maxInferenceRows` sampled rows (reference caps at 128,
  * src/config/mod.rs:25-27); the resulting schema then drives a fully
  * distributed cast of the whole dataset.
  */
object TypeInference {

  /** Reference's sampling cap, honoring the SENSAPP_MAX_INFERENCES_ROWS
    * override (reference: src/config/mod.rs:25-27; default 128). */
  def MaxInferenceRows: Int = graft.Config.maxInferenceRows

  sealed trait InferredValue
  final case class IntegerV(v: Long) extends InferredValue
  final case class NumericV(v: BigDecimal) extends InferredValue
  final case class FloatV(v: Double) extends InferredValue
  final case class StringV(v: String) extends InferredValue
  final case class BooleanV(v: Boolean) extends InferredValue
  final case class JsonV(v: String) extends InferredValue
  /** epoch microseconds, UTC */
  final case class DateTimeV(us: Long) extends InferredValue

  sealed trait ColumnType
  object ColumnType {
    case object IntegerC extends ColumnType
    case object NumericC extends ColumnType
    case object FloatC extends ColumnType
    case object StringC extends ColumnType
    case object BooleanC extends ColumnType
    case object DateTimeC extends ColumnType
    case object JsonC extends ColumnType
  }
  import ColumnType._

  private val IntRe = """[+-]?\d+""".r
  // nom recognize_float: [+-]? ( digit+ (. digit*)? | . digit+ ) ([eE][+-]?digit+)?
  private val FloatRe = """[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""".r
  private val BoolRe = """(?i)true|false""".r

  private def parseInteger(s: String): Option[InferredValue] =
    if (IntRe.matches(s)) scala.util.Try(s.toLong).toOption.map(IntegerV)
    else None

  /** nom's `double` accepts inf/NaN spellings but the reference rejects
    * them so they fall through to String
    * (reference: src/infer/parsing.rs:33-46). Overflow to ±Inf (e.g. 1e999)
    * is likewise rejected.
    */
  private def parseFloat(s: String): Option[InferredValue] =
    if (!FloatRe.matches(s)) None
    else {
      val d = s.toDouble
      if (d.isInfinite || d.isNaN) None else Some(FloatV(d))
    }

  /** Numeric (exact decimal) mode: same surface grammar, but exponents and
    * >28-significant-digit values fail like rust_decimal's `from_str`
    * (reference: src/infer/parsing.rs:48-60).
    */
  private def parseNumeric(s: String): Option[InferredValue] =
    if (!FloatRe.matches(s) || s.exists(c => c == 'e' || c == 'E')) None
    else scala.util.Try(BigDecimal(s)).toOption
      .filter(d => d.underlying.unscaledValue.bitLength <= 96)
      .map(NumericV)

  private def parseBoolean(s: String): Option[InferredValue] =
    if (BoolRe.matches(s)) Some(BooleanV(s.equalsIgnoreCase("true"))) else None

  private def isLikelyJson(s: String): Boolean =
    (s.startsWith("{") && s.endsWith("}")) ||
      (s.startsWith("[") && s.endsWith("]"))

  private def parseJson(s: String): Option[InferredValue] =
    if (isLikelyJson(s) && JsonMini.isValid(s)) Some(JsonV(s)) else None

  // ISO8601 date 'T' time, with YMD / ordinal (YYYY-DDD) / week (YYYY-Www-D)
  // dates. The reference converts week/ordinal by adding day offsets to
  // Jan 1 and ADDS the timezone offset to the epoch (a reference quirk we
  // reproduce; pinned: "1969-358T14:21:32.0933+05:35" ->
  // 1969-12-24T19:56:32.093Z; reference: src/infer/parsing.rs:93-169,
  // src/infer/columns.rs:343-357).
  private val DateTimeRe =
    ("""(?<ymdY>[+-]?\d{4})-(?:(?<m>\d{2})-(?<d>\d{2})|W(?<ww>\d{2})-(?<wd>\d)|(?<ddd>\d{3}))""" +
      """T(?<h>\d{2}):(?<min>\d{2})(?::(?<s>\d{2})(?:[.,](?<frac>\d+))?)?""" +
      """(?<tz>Z|[+-]\d{2}(?::?\d{2})?)?""").r

  /** Public datetime parse used by importers: epoch µs, or None. */
  def parseDateTimeUs(s: String): Option[Long] =
    parseDateTime(s).collect { case DateTimeV(us) => us }

  private def parseDateTime(s: String): Option[InferredValue] = {
    DateTimeRe.findPrefixMatchOf(s) match {
      case Some(m) if m.matched.length == s.length =>
        try {
          val year = m.group("ymdY").toInt
          val (month, day, extraDays) =
            if (m.group("m") != null) (m.group("m").toInt, m.group("d").toInt, 0L)
            else if (m.group("ww") != null)
              (1, 1, 7L * (m.group("ww").toLong - 1) + (m.group("wd").toLong - 1))
            else (1, 1, m.group("ddd").toLong - 1)
          val base = LocalDate.of(year, month, day)
          val h = m.group("h").toInt
          val min = m.group("min").toInt
          val sec = Option(m.group("s")).map(_.toInt).getOrElse(0)
          if (h > 23 || min > 59 || sec > 60) return None
          // fraction -> whole milliseconds (reference keeps ms resolution)
          val ms = Option(m.group("frac")).map { f =>
            (BigDecimal("0." + f) * 1000).toLong
          }.getOrElse(0L)
          var us = base.toEpochDay * 86400000000L + extraDays * 86400000000L +
            h * 3600000000L + min * 60000000L + sec * 1000000L + ms * 1000L
          Option(m.group("tz")).filter(_ != "Z").foreach { tz =>
            val sign = if (tz.startsWith("-")) -1 else 1
            val digits = tz.drop(1).replace(":", "")
            val oh = digits.take(2).toLong
            val om = if (digits.length > 2) digits.drop(2).toLong else 0L
            // reference ADDS the offset (src/infer/parsing.rs:127-135)
            us += sign * (oh * 3600000000L + om * 60000000L)
          }
          Some(DateTimeV(us))
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Single-value inference chain
    * (reference: src/infer/parsing.rs:171-224).
    */
  def inferType(
      raw: String,
      trim: Boolean = true,
      numeric: Boolean = false): InferredValue = {
    val s = if (trim) raw.trim else raw
    val chain: Seq[String => Option[InferredValue]] =
      if (numeric) Seq(parseNumeric, parseBoolean, parseDateTime, parseJson)
      else Seq(parseInteger, parseFloat, parseBoolean, parseDateTime, parseJson)
    chain.view.flatMap(p => p(s)).headOption.getOrElse(StringV(raw))
  }

  /** Column-level unification lattice
    * (reference: src/infer/columns.rs:17-167): any String => String; Json
    * absorbs scalars; Boolean or DateTime mixed with numbers => String;
    * Float absorbs Integer; empty => Integer.
    */
  def inferColumnType(
      values: Seq[String],
      trim: Boolean = true,
      numeric: Boolean = false): ColumnType = {
    val inferred = values.map(inferType(_, trim, numeric))
    val hasString = inferred.exists(_.isInstanceOf[StringV])
    val hasJson = inferred.exists(_.isInstanceOf[JsonV])
    val hasBool = inferred.exists(_.isInstanceOf[BooleanV])
    val hasDt = inferred.exists(_.isInstanceOf[DateTimeV])
    val hasNum = inferred.exists(_.isInstanceOf[NumericV])
    val hasFloat = inferred.exists(_.isInstanceOf[FloatV])
    val hasInt = inferred.exists(_.isInstanceOf[IntegerV])
    if (hasString) StringC
    else if (hasJson) JsonC
    else if (hasBool) { if (hasInt || hasNum || hasFloat || hasDt) StringC else BooleanC }
    else if (hasDt) { if (hasInt || hasNum || hasFloat) StringC else DateTimeC }
    else if (hasNum) NumericC
    else if (hasFloat) FloatC
    else IntegerC
  }

  /** Datetime-column scoring
    * (reference: src/infer/datetime_guesser.rs:4-91). Arbitrary but pinned
    * numbers — kept identical.
    */
  def isLikelyTimestampLong(v: Long): Boolean =
    v >= 946684800L && v <= 4670438400L
  def isLikelyTimestampDouble(v: Double): Boolean =
    v >= 946684800.0 && v <= 4670438400.0

  def datetimeGuesser(
      columnName: String,
      colType: ColumnType,
      values: Seq[String]): Int = {
    val lower = columnName.toLowerCase
    var sum = lower match {
      case "datetime" => 100
      case "timestamp" => 99
      case "date" => 50
      case "time" => 49
      case "created_at" | "createdat" => 38
      case "updated_at" | "updatedat " => 37
      case "recorded_at" | "recordedat" => 36
      case _ => 0
    }
    if (sum == 0) {
      if (lower.contains("date")) sum += 10
      if (lower.contains("time")) sum += 9
      if (lower.endsWith("at")) sum += 4
    }
    sum += (colType match {
      case DateTimeC => 100
      case IntegerC =>
        val parsed = values.map(v => inferType(v))
        if (parsed.forall {
          case IntegerV(x) => isLikelyTimestampLong(x); case _ => true
        }) 42 else 2
      case NumericC =>
        val parsed = values.map(v => inferType(v, numeric = true))
        if (parsed.forall {
          case NumericV(x) =>
            x >= BigDecimal(946684800L) && x <= BigDecimal(4670438400L)
          case _ => true
        }) 42 else 2
      case FloatC =>
        val parsed = values.map(v => inferType(v))
        if (parsed.forall {
          case FloatV(x) => isLikelyTimestampDouble(x)
          case IntegerV(x) => isLikelyTimestampLong(x)
          case _ => true
        }) 32 else 1
      case BooleanC => -80
      case StringC => -100
      case JsonC => -128
    })
    sum
  }

  /** Best-scoring datetime column with score >= 5
    * (reference: src/infer/datetime_guesser.rs:92-150).
    */
  def likelyDatetimeColumn(
      columnNames: Seq[String],
      columns: Seq[Seq[String]],
      trim: Boolean = true,
      numeric: Boolean = false): Option[String] = {
    val scored = columnNames.zip(columns).map { case (name, vals) =>
      name -> datetimeGuesser(name, inferColumnType(vals, trim, numeric), vals)
    }
    scored.filter(_._2 >= 5).sortBy(-_._2).headOption.map(_._1)
  }

  /** First row is a header iff every cell infers as a non-empty String
    * (reference: src/infer/is_header.rs:3-19).
    */
  def isHeader(cells: Seq[String]): Boolean =
    cells.nonEmpty && cells.forall { c =>
      inferType(c, trim = false) match {
        case StringV(v) => v.nonEmpty
        case _ => false
      }
    }
}

/** Minimal strict JSON validity check (no external deps). */
private[graft] object JsonMini {
  def isValid(s: String): Boolean = {
    val p = new Parser(s)
    try { p.skipWs(); p.value(); p.skipWs(); p.done } catch { case _: Exception => false }
  }

  private final class Parser(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && " \t\n\r".indexOf(s.charAt(i)) >= 0) i += 1
    private def fail(): Nothing = throw new IllegalArgumentException(s"bad json at $i")
    private def ch: Char = if (i < s.length) s.charAt(i) else fail()
    def value(): Unit = {
      skipWs()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true")
        case 'f' => lit("false")
        case 'n' => lit("null")
        case _ => num()
      }
    }
    private def lit(l: String): Unit =
      if (s.regionMatches(i, l, 0, l.length)) i += l.length else fail()
    private def obj(): Unit = {
      i += 1; skipWs()
      if (ch == '}') { i += 1; return }
      while (true) {
        skipWs(); if (ch != '"') fail(); str(); skipWs()
        if (ch != ':') fail(); i += 1
        value(); skipWs()
        ch match {
          case ',' => i += 1
          case '}' => i += 1; return
          case _ => fail()
        }
      }
    }
    private def arr(): Unit = {
      i += 1; skipWs()
      if (ch == ']') { i += 1; return }
      while (true) {
        value(); skipWs()
        ch match {
          case ',' => i += 1
          case ']' => i += 1; return
          case _ => fail()
        }
      }
    }
    private def str(): Unit = {
      i += 1
      while (ch != '"') {
        if (ch == '\\') { i += 1; if (i >= s.length) fail() }
        i += 1
      }
      i += 1
    }
    private def num(): Unit = {
      val start = i
      if (ch == '-') i += 1
      while (i < s.length && (s.charAt(i).isDigit || ".eE+-".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) fail()
      val _ = java.lang.Double.parseDouble(s.substring(start, i))
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol ingest (S4):
  * `measurement[,tag=v...] field=value[,field=value...] [timestamp]`.
  *
  * Semantics mirrored from the reference handler
  * (reference: src/ingestors/http/influxdb.rs:53-305):
  *  - sensor name = `urlencode(measurement) + " " + urlencode(fieldKey)`;
  *  - labels = influxdb_bucket + influxdb_org + tags, only when the line
  *    has tags;
  *  - field types: i64 (`42i`), u64 (`42u`, must fit i64), f64, bool
  *    (`t/f/true/false/T/F/...`), quoted string;
  *  - timestamps decoded at ns/us/ms/s precision to µs.
  *
  * The parser itself runs distributed via `flatMap` over a `Dataset[String]`
  * of lines — per-partition imperative logic is genuine here (a recursive
  * descent grammar is not expressible as Column ops).
  */
object InfluxLineProtocol {

  sealed trait FieldValue
  final case class I64(v: Long) extends FieldValue
  final case class F64(v: Double) extends FieldValue
  final case class Str(v: String) extends FieldValue
  final case class Bool(v: Boolean) extends FieldValue

  final case class ParsedField(
      measurement: String,
      tags: Seq[(String, String)],
      fieldKey: String,
      valueType: String, // Integer | Float | String | Boolean
      longValue: Option[Long],
      doubleValue: Option[Double],
      stringValue: Option[String],
      boolValue: Option[Boolean],
      timestamp: Option[Long])

  /** RFC 3986 percent-encoding (unreserved chars kept), matching the
    * reference's `urlencoding::encode`.
    */
  def urlencode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val c = b.toChar
      if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~')
        sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Parse one line; throws IllegalArgumentException on malformed input
    * (the reference fails the whole request on any bad line).
    */
  def parseLine(line: String): Seq[ParsedField] = {
    val s = line.trim
    if (s.isEmpty || s.startsWith("#")) return Nil
    var i = 0

    def parseEscaped(stopChars: Set[Char]): String = {
      val sb = new StringBuilder
      while (i < s.length && !stopChars.contains(s.charAt(i))) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }

    val measurement = parseEscaped(Set(',', ' '))
    require(measurement.nonEmpty, s"empty measurement in: $line")
    val tags = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (i < s.length && s.charAt(i) == ',') {
      i += 1
      val k = parseEscaped(Set('=', ',', ' '))
      require(i < s.length && s.charAt(i) == '=', s"bad tag in: $line")
      i += 1
      val v = parseEscaped(Set(',', ' '))
      tags += (k -> v)
    }
    require(i < s.length && s.charAt(i) == ' ', s"missing fields in: $line")
    while (i < s.length && s.charAt(i) == ' ') i += 1

    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, FieldValue)]
    var more = true
    while (more) {
      val k = parseEscaped(Set('=', ',', ' '))
      require(i < s.length && s.charAt(i) == '=', s"bad field in: $line")
      i += 1
      val v: FieldValue =
        if (i < s.length && s.charAt(i) == '"') {
          i += 1
          val sb = new StringBuilder
          while (i < s.length && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\' && i + 1 < s.length) {
              sb.append(s.charAt(i + 1)); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          require(i < s.length, s"unterminated string in: $line")
          i += 1
          Str(sb.toString)
        } else {
          val tok = parseEscaped(Set(',', ' '))
          require(tok.nonEmpty, s"empty field value in: $line")
          tok.last match {
            case 'i' => I64(tok.dropRight(1).toLong)
            case 'u' =>
              val bi = BigInt(tok.dropRight(1))
              require(bi.isValidLong, "U64 value is too big to be converted to i64")
              I64(bi.toLong)
            case _ =>
              tok.toLowerCase match {
                case "t" | "true" => Bool(true)
                case "f" | "false" => Bool(false)
                case _ => F64(tok.toDouble)
              }
          }
        }
      fields += (k -> v)
      more = i < s.length && s.charAt(i) == ','
      if (more) i += 1
    }
    while (i < s.length && s.charAt(i) == ' ') i += 1
    val ts = if (i < s.length) Some(s.substring(i).trim.toLong) else None

    fields.toSeq.map { case (k, fv) =>
      val (t, l, dd, st, b) = fv match {
        case I64(v) => ("Integer", Some(v), None, None, None)
        case F64(v) => ("Float", None, Some(v), None, None)
        case Str(v) => ("String", None, None, Some(v), None)
        case Bool(v) => ("Boolean", None, None, None, Some(v))
      }
      ParsedField(measurement, tags.toSeq, k, t, l, dd, st, b, ts)
    }
  }

  def precisionToMicros(precision: String): Long => Long = precision match {
    case "ns" => _ / 1000
    case "us" => identity
    case "ms" => _ * 1000
    case "s" => _ * 1000000
    case p => throw new IllegalArgumentException(s"Invalid precision: $p")
  }

  /** Distributed parse of a dataset of lines into the normalized long
    * layout: sensor_name, labels entries, timestamp_us, typed values.
    */
  def parse(
      lines: Dataset[String],
      bucket: String,
      org: String,
      precision: String = "ns"): DataFrame = {
    import lines.sparkSession.implicits._
    val toUs = precisionToMicros(precision)
    lines.flatMap { line =>
      parseLine(line).map { f =>
        val name = urlencode(f.measurement) + " " + urlencode(f.fieldKey)
        val labels: Map[String, String] =
          if (f.tags.isEmpty) Map.empty
          else (Seq("influxdb_bucket" -> bucket, "influxdb_org" -> org)
            ++ f.tags).toMap
        (name, labels, f.timestamp.map(toUs), f.valueType,
          f.longValue, f.doubleValue, f.stringValue, f.boolValue)
      }
    }.toDF("sensor_name", "labels", "timestamp_us", "type",
      "long_value", "double_value", "string_value", "bool_value")
  }
}

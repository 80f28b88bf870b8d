package graft

import graft.infer.TypeInference
import graft.infer.TypeInference._
import graft.infer.TypeInference.ColumnType._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's inference lattice and parsers
  * (reference: src/infer/parsing.rs:226-655, src/infer/columns.rs:169-358,
  * FIXTURES.md §3).
  */
class TypeInferenceSpec extends AnyFunSuite {

  test("scalar inference chain") {
    assert(inferType("42") == IntegerV(42))
    assert(inferType("-42") == IntegerV(-42))
    assert(inferType("0") == IntegerV(0))
    assert(inferType("42.0") == FloatV(42.0))
    assert(inferType("-42.0") == FloatV(-42.0))
    assert(inferType("12345678901.12345678901") == FloatV(1.2345678901123457e10))
    assert(inferType("abcd") == StringV("abcd"))
    assert(inferType("{}") == JsonV("{}"))
    assert(inferType("""[{"a": 1}]""") == JsonV("""[{"a": 1}]"""))
  }

  test("no-trim mode: trailing whitespace falls back to string") {
    assert(inferType("42.0\n", trim = false) == StringV("42.0\n"))
    assert(inferType(" true ", trim = false) == StringV(" true "))
  }

  test("trim mode trims everything except strings") {
    assert(inferType(" true ") == BooleanV(true))
    assert(inferType("FALSE\n") == BooleanV(false))
    assert(inferType(" 42 ") == IntegerV(42))
  }

  test("inf and NaN literals are strings (reference: parsing.rs:33-46)") {
    assert(inferType("inf") == StringV("inf"))
    assert(inferType("NaN") == StringV("NaN"))
    assert(inferType("-inf") == StringV("-inf"))
    // overflow to infinity also rejected
    assert(inferType("1e999") == StringV("1e999"))
  }

  test("ISO8601 datetimes incl. ordinal dates and added offsets") {
    assert(inferType("2020-01-01T00:00:00Z") ==
      DateTimeV(1577836800000000L))
    // pinned: 1969-358T14:21:32.0933+05:35 -> 1969-12-24T19:56:32.093Z
    // (reference: src/infer/columns.rs:343-357; the reference ADDS the
    // zone offset)
    val expected = java.time.LocalDateTime
      .of(1969, 12, 24, 19, 56, 32, 93000000)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 93000
    assert(inferType("1969-358T14:21:32.0933+05:35") ==
      DateTimeV(java.time.LocalDateTime.of(1969, 12, 24, 19, 56, 32)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 93000L))
  }

  test("numeric (exact) mode") {
    assert(inferType("78953678389071", numeric = true) ==
      NumericV(BigDecimal("78953678389071")))
    assert(inferType("2.2", numeric = true) == NumericV(BigDecimal("2.2")))
    // rust_decimal rejects exponents -> string
    assert(inferType("1e3", numeric = true) == StringV("1e3"))
  }

  test("column lattice") {
    assert(inferColumnType(Seq("1", "2", "3", "4")) == IntegerC)
    assert(inferColumnType(Seq("1.1", "2", "3.3")) == FloatC)
    assert(inferColumnType(Seq("true", "FALSE")) == BooleanC)
    assert(inferColumnType(Seq("true", "1")) == StringC)    // bool+num -> string
    assert(inferColumnType(Seq("2020-01-01T00:00:00Z", "1")) == StringC)
    assert(inferColumnType(Seq("{\"a\": 1}", "42")) == JsonC) // json absorbs
    assert(inferColumnType(Seq("abc", "1")) == StringC)
    assert(inferColumnType(Seq()) == IntegerC)               // empty -> Integer
    assert(inferColumnType(
      Seq("2020-01-01T00:00:00Z", "1969-358T14:21:32.0933+05:35")) == DateTimeC)
    assert(inferColumnType(Seq("78953678389071", "2.2"), numeric = true) == NumericC)
  }

  test("datetime column guesser scores") {
    // name wins: "datetime" = 100
    assert(datetimeGuesser("datetime",
      inferColumnType(Seq("2020-01-01T00:00:00Z")),
      Seq("2020-01-01T00:00:00Z")) == 200)
    // integer epoch range
    assert(datetimeGuesser("ts", IntegerC, Seq("1700000000")) == 42)
    assert(datetimeGuesser("ts", IntegerC, Seq("12")) == 2)
    // "updated" contains "date" (+10), String column (-100)
    assert(datetimeGuesser("updated", StringC, Seq("x")) == -90)
  }

  test("likelyDatetimeColumn requires score >= 5 and picks the best") {
    val names = Seq("datetime", "sensor_name", "value")
    val cols = Seq(Seq("2024-01-01T00:00:00Z"), Seq("temp"), Seq("20.5"))
    assert(TypeInference.likelyDatetimeColumn(names, cols) == Some("datetime"))
    assert(TypeInference.likelyDatetimeColumn(
      Seq("a", "b"), Seq(Seq("x"), Seq("y"))).isEmpty)
  }

  test("is_header: all cells non-empty strings") {
    assert(TypeInference.isHeader(Seq("datetime", "sensor_name", "value")))
    assert(!TypeInference.isHeader(Seq("datetime", "42")))
    assert(!TypeInference.isHeader(Seq("datetime", "")))
    assert(!TypeInference.isHeader(Nil))
  }
}

class GeoGuesserSpec extends AnyFunSuite {
  import graft.infer.GeoGuesser
  import graft.infer.GeoGuesser.{Latitude, Longitude}
  import graft.infer.TypeInference.ColumnType._

  // score vectors pinned from reference src/infer/geo_guesser.rs:140-187
  test("lat_long_guesser scores match the reference vectors") {
    val floats = Seq("0.0", "1.0", "2.0")
    assert(GeoGuesser.latLongGuesser(Latitude, "lat", FloatC, floats) == 199)
    assert(GeoGuesser.latLongGuesser(Longitude, "lon", FloatC, floats) == 199)
    assert(GeoGuesser.latLongGuesser(Longitude, "geo_longitude", FloatC, floats) == 199)
    assert(GeoGuesser.latLongGuesser(Longitude, "geoloc_lng", FloatC, floats) == 199)
    assert(GeoGuesser.latLongGuesser(Longitude, "speed", FloatC, floats) == -101)
    assert(GeoGuesser.latLongGuesser(Longitude, "altitude", FloatC, floats) == -101)

    val outOfRange = Seq("0.0", "1.0", "2.0", "200.0")
    assert(GeoGuesser.latLongGuesser(Latitude, "lat", FloatC, outOfRange) == -1)
    assert(GeoGuesser.latLongGuesser(Longitude, "lon", FloatC, outOfRange) == -1)
    assert(GeoGuesser.latLongGuesser(Longitude, "speed", FloatC, outOfRange) == -301)

    val nums = Seq("0", "1", "2")
    assert(GeoGuesser.latLongGuesser(Latitude, "lat", NumericC, nums) == 198)
    assert(GeoGuesser.latLongGuesser(Longitude, "lon", NumericC, nums) == 198)
    val numsOut = Seq("0", "1", "2", "200")
    assert(GeoGuesser.latLongGuesser(Latitude, "lat", NumericC, numsOut) == -2)

    val bools = Seq("true", "false", "true")
    assert(GeoGuesser.latLongGuesser(Latitude, "lat", BooleanC, bools) == -3)
    assert(GeoGuesser.latLongGuesser(Longitude, "ready", BooleanC, bools) == -303)
  }

  test("likely_geo_columns picks matching-score pairs only") {
    val floats = Seq("0.0", "1.0", "2.0")
    val cols = Seq(floats, floats, floats, floats)
    assert(GeoGuesser.likelyGeoColumns(
      Seq("lat", "lon", "speed", "altitude"), cols) == Some(("lat", "lon")))
    assert(GeoGuesser.likelyGeoColumns(
      Seq("weight", "height", "speed", "altitude"), cols).isEmpty)
    // lat float (199) vs lon numeric-only shape mismatch -> None needs
    // unequal scores; emulate with one out-of-range longitude column
    assert(GeoGuesser.likelyGeoColumns(
      Seq("lat", "height", "speed", "altitude"), cols).isEmpty)
  }
}

class BodyCodecSpec extends AnyFunSuite {
  import graft.sources.BodyCodec

  test("gzip body decode roundtrip; plain passthrough; unknown rejected") {
    val s = "cpu,host=A usage=64.2 1590488773254420000\n"
    assert(BodyCodec.decodeBody(BodyCodec.gzip(s), Some("gzip")) == s)
    assert(BodyCodec.decodeBody(s.getBytes("UTF-8"), None) == s)
    intercept[IllegalArgumentException] {
      BodyCodec.decodeBody(s.getBytes("UTF-8"), Some("br"))
    }
  }

  test("gunzip stops at the decoded cap (gzip bomb never buffers)") {
    val bomb = "0" * 1000000 // 1 MB of zeros gzips to ~1 KB
    val wire = BodyCodec.gzip(bomb)
    assert(wire.length < 10000)
    intercept[graft.sources.DecodedBodyTooLarge] {
      BodyCodec.decodeBody(wire, Some("gzip"), maxDecoded = 64 * 1024)
    }
    // generous cap admits the same payload unchanged
    assert(BodyCodec.decodeBody(wire, Some("gzip"),
      maxDecoded = 2000000) == bomb)
    // plain bodies are capped too (the wire cap normally fires first)
    intercept[graft.sources.DecodedBodyTooLarge] {
      BodyCodec.decodeBody(bomb.getBytes("UTF-8"), None, maxDecoded = 1024)
    }
  }
}

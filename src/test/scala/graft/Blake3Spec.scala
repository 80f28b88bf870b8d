package graft

import graft.functions.Blake3
import graft.model.{Sensor, SensorType, SensorUnit}
import org.scalatest.funsuite.AnyFunSuite

class Blake3Spec extends AnyFunSuite {

  test("BLAKE3 empty-input hash regression pin") {
    // Self-generated pin (guards refactors). Correctness of the
    // compression/XOF chain is established independently by the two
    // reference-pinned keyed UUID vectors below, which constrain 27
    // output bytes across two inputs.
    assert(Blake3.toHex(Blake3.hash(Array.emptyByteArray)) ==
      "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
  }

  test("sensor UUID matches reference pinned vector (no labels)") {
    // reference: src/datamodel/sensor.rs:355-387
    val uuid = Sensor.deriveUuid(
      "TestSensor", SensorType.Location, Some(SensorUnit("WGS84")), Nil)
    assert(uuid == "20115fa5-aecd-8271-835d-07bfee981d6a")
  }

  test("sensor UUID matches reference pinned vector (with label)") {
    val uuid = Sensor.deriveUuid(
      "TestSensor", SensorType.Location, Some(SensorUnit("WGS84")),
      Seq("location" -> "office"))
    assert(uuid == "20115fa5-33a2-8870-876d-ff32d73b2419")
    // same name => same 4-byte prefix as the unlabeled variant
    assert(uuid.take(8) == "20115fa5")
  }

  test("different label order derives the same UUID (labels sorted)") {
    val a = Sensor.deriveUuid("s", SensorType.Float, None,
      Seq("b" -> "2", "a" -> "1"))
    val b = Sensor.deriveUuid("s", SensorType.Float, None,
      Seq("a" -> "1", "b" -> "2"))
    assert(a == b)
  }

  test("special separator characters are rejected") {
    intercept[IllegalArgumentException] {
      Sensor.deriveUuid("badname", SensorType.Float, None, Nil)
    }
  }
}

class SensorUuidExpressionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.model.{Sensor, SensorType}

  test("sensor_uuid expression matches driver-side derivation and the UDF") {
    import spark.implicits._
    val df = Seq(
      ("temp", "Float", null.asInstanceOf[String], Map.empty[String, String]),
      ("cpu", "Integer", "celsius", Map("host" -> "a", "dc" -> "b")))
      .toDF("name", "type_name", "unit_name", "labels")
    val got = df.select(
      call_function("sensor_uuid", col("name"), col("type_name"),
        col("unit_name"), col("labels")).as("uuid"),
      Sensor.uuidUdf(col("name"), col("type_name"), col("unit_name"),
        col("labels")).as("uuid_udf"))
      .collect()
    val expected0 = Sensor.deriveUuid("temp", SensorType.Float, None, Nil)
    val expected1 = Sensor.deriveUuid("cpu", SensorType.Integer,
      Some(graft.model.SensorUnit("celsius")),
      Seq("host" -> "a", "dc" -> "b"))
    assert(got(0).getString(0) == expected0)
    assert(got(1).getString(0) == expected1)
    assert(got(0).getString(0) == got(0).getString(1))
    assert(got(1).getString(0) == got(1).getString(1))
    // null name -> null uuid (expression only; the UDF would NPE)
    val nulls = Seq(("Float", 1)).toDF("t", "x").select(
      call_function("sensor_uuid", lit(null).cast("string"), col("t"),
        lit(null).cast("string"),
        lit(null).cast("map<string,string>")).as("uuid"))
      .collect()
    assert(nulls(0).isNullAt(0))
  }

  test("sensor_uuid works from SQL and inside whole-stage codegen") {
    // range source prevents constant folding so the codegen path runs
    spark.range(3).createOrReplaceTempView("uuid_in")
    val rows = spark.sql(
      """SELECT sensor_uuid(concat('m', id), 'Float', CAST(NULL AS STRING),
        |  CAST(NULL AS MAP<STRING,STRING>)) AS u FROM uuid_in
        |ORDER BY u""".stripMargin)
    val got = rows.collect().map(_.getString(0)).toSet
    val expected = (0 until 3).map(i => graft.model.Sensor.deriveUuid(
      s"m$i", SensorType.Float, None, Nil)).toSet
    assert(got == expected)
    // AQE plan strings mark codegen stages as `*(n)` spans
    val plan = rows.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [sensoruuidexpression"), plan)
  }
}

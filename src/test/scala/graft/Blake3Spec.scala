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

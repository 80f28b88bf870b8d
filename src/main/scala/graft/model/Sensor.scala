package graft.model

import graft.functions.Blake3

/** Documentation-only measurement unit
  * (reference: src/datamodel/unit.rs:5-9).
  */
final case class SensorUnit(name: String, description: Option[String] = None)

/** A sensor (= one typed time series). Labels are sorted by (key, value)
  * (reference: src/datamodel/sensor.rs:12-19,43-51).
  */
final case class Sensor(
    uuid: String,
    name: String,
    sensorType: SensorType,
    unit: Option[SensorUnit],
    labels: Seq[(String, String)])

object Sensor {

  /** Strings may not contain ASCII 11/28/29/30/31
    * (reference: src/datamodel/sensor.rs:53-69).
    */
  private def containsSpecial(s: String): Boolean =
    s.exists(c => c == 11 || c == 28 || c == 29 || c == 30 || c == 31)

  def sortLabels(labels: Seq[(String, String)]): Seq[(String, String)] =
    labels.sortBy(identity)

  /** Content-addressed UUIDv8: keyed-BLAKE3 of the canonical byte layout.
    * First 4 bytes hash the name only (so series of a metric share a
    * prefix); remaining 12 hash the full buffer
    * `name RS typeByte RS unitName RS (key US value RS)*`
    * (reference: src/datamodel/sensor.rs:82-178). Keyed with
    * derive_key("SENSAPP uuid hash mac 2024-01-19 strings to unique ids",
    * salt); default salt "sensapp" (reference: src/config/mod.rs:31).
    */
  val KeyContext = "SENSAPP uuid hash mac 2024-01-19 strings to unique ids"
  /** Honors SENSAPP_SENSOR_SALT (reference: src/config/mod.rs:32-33). */
  def DefaultSalt: String = graft.Config.sensorSalt

  // derive_key is ~1 µs and deriveUuid runs per ROW on the ingest hot
  // path — memoize per salt (tiny domain: the configured salt, plus
  // whatever tests pass explicitly)
  private val keyCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  def hashKey(salt: String = DefaultSalt): Array[Byte] =
    keyCache.computeIfAbsent(salt,
      s => Blake3.deriveKey(KeyContext, s.getBytes("UTF-8")))

  def uuidBuffer(
      name: String,
      sensorType: SensorType,
      unit: Option[SensorUnit],
      sortedLabels: Seq[(String, String)]): Array[Byte] = {
    require(!containsSpecial(name), s"name '$name' contains special characters")
    sortedLabels.foreach { case (k, v) =>
      require(!containsSpecial(k), s"label key '$k' contains special characters")
      require(!containsSpecial(v), s"label value '$v' contains special characters")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(name.getBytes("UTF-8"))
    out.write(30)
    out.write(sensorType.id) // single LE byte
    out.write(30)
    unit.foreach(u => out.write(u.name.getBytes("UTF-8")))
    out.write(30)
    sortedLabels.foreach { case (k, v) =>
      out.write(k.getBytes("UTF-8"))
      out.write(31)
      out.write(v.getBytes("UTF-8"))
      out.write(30)
    }
    out.toByteArray
  }

  def deriveUuid(
      name: String,
      sensorType: SensorType,
      unit: Option[SensorUnit] = None,
      labels: Seq[(String, String)] = Nil,
      salt: String = DefaultSalt): String = {
    val key = hashKey(salt)
    val nameHash = Blake3.keyedHash(key, name.getBytes("UTF-8"), 4)
    val bufHash = Blake3.keyedHash(
      key, uuidBuffer(name, sensorType, unit, sortLabels(labels)), 12)
    val bytes = new Array[Byte](16)
    System.arraycopy(nameHash, 0, bytes, 0, 4)
    System.arraycopy(bufHash, 0, bytes, 4, 12)
    // UUIDv8 custom bytes: set version (8) and RFC4122 variant bits
    bytes(6) = ((bytes(6) & 0x0f) | 0x80).toByte
    bytes(8) = ((bytes(8) & 0x3f) | 0x80).toByte
    val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** Distributed UUID derivation over
    * (name, type displayName, unit name|null, labels map|null) columns —
    * the ingest-path analog of [[deriveUuid]]. Deterministic, so safe to
    * evaluate anywhere in the plan.
    */
  def uuidUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf {
      (name: String, typeName: String, unitName: String,
          labels: Map[String, String]) =>
        deriveUuid(name,
          SensorType.fromString(typeName).getOrElse(
            throw new IllegalArgumentException(s"bad type: $typeName")),
          Option(unitName).map(SensorUnit(_)),
          Option(labels).map(_.toSeq).getOrElse(Nil))
    }

  def create(
      name: String,
      sensorType: SensorType,
      unit: Option[SensorUnit] = None,
      labels: Seq[(String, String)] = Nil,
      salt: String = DefaultSalt): Sensor = {
    val sorted = sortLabels(labels)
    Sensor(deriveUuid(name, sensorType, unit, labels, salt), name, sensorType,
      unit, sorted)
  }
}

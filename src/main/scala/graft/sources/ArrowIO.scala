package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{Float8Vector, TimeStampMicroVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Arrow IPC file import/export (S3/S11) using the Apache Arrow Java
  * library Spark already ships.
  *
  * Schema contracts mirrored from the reference:
  *  - single Float series: `timestamp: Timestamp(µs, naive)`, `value:
  *    Float64` (reference: src/exporters/arrow/mod.rs:224-388);
  *  - multi-series "long" format: `timestamp(µs), sensor_id, sensor_name,
  *    value(utf8), type, labels(json utf8)` all non-null
  *    (reference: src/exporters/arrow/mod.rs:34-92);
  *  - import requires `timestamp` + `value` columns
  *    (reference: src/importers/arrow.rs:26-52).
  */
object ArrowIO {

  private lazy val allocator = new RootAllocator()

  final case class LongRow(
      timestampUs: Long, sensorId: String, sensorName: String,
      value: String, valueType: String, labelsJson: String)

  def floatSeriesSchema: Schema = new Schema(List(
    Field.notNullable("timestamp", new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)),
    Field.notNullable("value",
      new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))).asJava)

  /** Encode one Float series to Arrow IPC file bytes. */
  def encodeFloatSeries(samples: Seq[(Long, Double)]): Array[Byte] = {
    val root = VectorSchemaRoot.create(floatSeriesSchema, allocator)
    try {
      val ts = root.getVector("timestamp").asInstanceOf[TimeStampMicroVector]
      val v = root.getVector("value").asInstanceOf[Float8Vector]
      root.allocateNew()
      samples.zipWithIndex.foreach { case ((t, x), i) =>
        ts.setSafe(i, t); v.setSafe(i, x)
      }
      root.setRowCount(samples.length)
      writeIpc(root)
    } finally root.close()
  }

  /** Decode a Float-series IPC file; requires timestamp+value columns. */
  def decodeFloatSeries(bytes: Array[Byte]): Seq[(Long, Double)] = {
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val fields = root.getSchema.getFields.asScala
        .map(f => f.getName -> f.getType).toMap
      require(fields.contains("timestamp") && fields.contains("value"),
        "Arrow file must contain 'timestamp' and 'value' columns")
      require(fields("timestamp").isInstanceOf[ArrowType.Timestamp],
        "'timestamp' column must be a Timestamp")
      require(fields("value").isInstanceOf[ArrowType.FloatingPoint],
        "'value' column must be Float64 for a Float series")
      val out = Seq.newBuilder[(Long, Double)]
      while (reader.loadNextBatch()) {
        val ts = root.getVector("timestamp").asInstanceOf[TimeStampMicroVector]
        val v = root.getVector("value").asInstanceOf[Float8Vector]
        var i = 0
        while (i < root.getRowCount) {
          out += ((ts.get(i), v.get(i)))
          i += 1
        }
      }
      out.result()
    } finally reader.close()
  }

  /** Distributed Arrow bulk export: one IPC file payload per series,
    * encoded on the EXECUTORS (one shuffle on sensor_id, sorted sweep) —
    * the Flight-style bulk path the reference stops short of (its Arrow
    * exporter buffers one request's series on the server:
    * src/exporters/arrow/mod.rs:17-105). The driver only ever sees
    * `(sensor_id, n_samples, ipc bytes)` — response assembly is bounded
    * by the encoded payload, not the scanned samples; rows per series
    * are bounded by the caller's per-sensor limit upstream.
    */
  def encodeSeriesDistributed(samples: DataFrame): DataFrame = {
    import samples.sparkSession.implicits._
    samples
      .select(col("sensor_id").cast("string"),
        col("timestamp_us").cast("long"), col("value").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val sorted = it.map(r => (r._2, r._3)).toArray
          .sortBy(identity)(Ordering.Tuple2(
            Ordering.Long, Ordering.Double.TotalOrdering))
        (id, sorted.length.toLong, encodeFloatSeries(sorted.toSeq))
      }
      .toDF("sensor_id", "n_samples", "ipc")
  }

  /** Inverse of [[encodeSeriesDistributed]]: explode per-series IPC
    * payloads back to samples, decoded on the executors.
    */
  def decodeSeriesDistributed(encoded: DataFrame): DataFrame = {
    import encoded.sparkSession.implicits._
    encoded
      .select(col("sensor_id").cast("string"), col("ipc"))
      .as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeFloatSeries(bytes).map { case (t, v) => (id, t, v) }
      }
      .toDF("sensor_id", "timestamp_us", "value")
  }

  def longFormatSchema: Schema = new Schema(List(
    Field.notNullable("timestamp", new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)),
    Field.notNullable("sensor_id", ArrowType.Utf8.INSTANCE),
    Field.notNullable("sensor_name", ArrowType.Utf8.INSTANCE),
    Field.notNullable("value", ArrowType.Utf8.INSTANCE),
    Field.notNullable("type", ArrowType.Utf8.INSTANCE),
    Field.notNullable("labels", ArrowType.Utf8.INSTANCE)).asJava)

  /** Encode multi-series long-format rows to Arrow IPC file bytes. */
  def encodeLongFormat(rows: Seq[LongRow]): Array[Byte] = {
    val root = VectorSchemaRoot.create(longFormatSchema, allocator)
    try {
      root.allocateNew()
      val ts = root.getVector("timestamp").asInstanceOf[TimeStampMicroVector]
      def sv(name: String) = root.getVector(name).asInstanceOf[VarCharVector]
      val (id, nm, vl, tp, lb) = (sv("sensor_id"), sv("sensor_name"),
        sv("value"), sv("type"), sv("labels"))
      rows.zipWithIndex.foreach { case (r, i) =>
        ts.setSafe(i, r.timestampUs)
        id.setSafe(i, r.sensorId.getBytes("UTF-8"))
        nm.setSafe(i, r.sensorName.getBytes("UTF-8"))
        vl.setSafe(i, r.value.getBytes("UTF-8"))
        tp.setSafe(i, r.valueType.getBytes("UTF-8"))
        lb.setSafe(i, r.labelsJson.getBytes("UTF-8"))
      }
      root.setRowCount(rows.length)
      writeIpc(root)
    } finally root.close()
  }

  def decodeLongFormat(bytes: Array[Byte]): Seq[LongRow] = {
    val reader = new ArrowFileReader(
      new ByteArrayReadableSeekableByteChannel(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val out = Seq.newBuilder[LongRow]
      while (reader.loadNextBatch()) {
        val ts = root.getVector("timestamp").asInstanceOf[TimeStampMicroVector]
        def sv(name: String) = root.getVector(name).asInstanceOf[VarCharVector]
        val (id, nm, vl, tp, lb) = (sv("sensor_id"), sv("sensor_name"),
          sv("value"), sv("type"), sv("labels"))
        var i = 0
        while (i < root.getRowCount) {
          out += LongRow(ts.get(i),
            new String(id.get(i), "UTF-8"), new String(nm.get(i), "UTF-8"),
            new String(vl.get(i), "UTF-8"), new String(tp.get(i), "UTF-8"),
            new String(lb.get(i), "UTF-8"))
          i += 1
        }
      }
      out.result()
    } finally reader.close()
  }

  private def writeIpc(root: VectorSchemaRoot): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
    try {
      writer.start(); writer.writeBatch(); writer.end()
    } finally writer.close()
    out.toByteArray
  }
}

package graft

import graft.model.SensorType
import graft.store.SensorStore
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_store_spec").toString

  private lazy val sampleData = Seq(
    ("s1", 1704067200000000L, 1.0), // 2024-01
    ("s1", 1706745600000000L, 2.0), // 2024-02
    ("s2", 1704067200000000L, 3.0))
    .toDF("sensor_id", "timestamp_us", "value")

  test("publish + read roundtrip with month partitioning") {
    val store = new SensorStore(spark, tempDir())
    store.publishSamples(SensorType.Float, sampleData)
    val back = store.samples(SensorType.Float)
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("sensor_id", "timestamp_us", "value"))
    // month partition pruning: a January-only filter reads 1 partition
    val pruned = back
      .filter(col("timestamp_us") < 1705000000000000L)
    assert(pruned.count() == 2)
  }

  test("catalog merge dedups on uuid, existing wins") {
    val store = new SensorStore(spark, tempDir())
    val s1 = Seq(("u1", "temp", "Float")).toDF("uuid", "name", "type")
      .withColumn("unit", lit(null).cast("struct<name:string,description:string>"))
      .withColumn("labels", lit(null).cast("map<string,string>"))
    store.publishSensors(s1)
    store.publishSensors(s1.withColumn("name", lit("other")))
    val cat = store.sensors.collect()
    assert(cat.length == 1)
    assert(cat.head.getString(1) == "temp") // first publish wins
  }

  test("vacuum compacts while preserving data and sort") {
    val store = new SensorStore(spark, tempDir())
    store.publishSamples(SensorType.Float, sampleData)
    store.publishSamples(SensorType.Float, sampleData) // second append
    assert(store.samples(SensorType.Float).count() == 6)
    store.vacuum(SensorType.Float)
    val after = store.samples(SensorType.Float)
    assert(after.count() == 6)
  }

  test("empty store returns empty frames with canonical schemas") {
    val store = new SensorStore(spark, tempDir())
    assert(store.sensors.count() == 0)
    assert(store.samples(SensorType.Integer).count() == 0)
    assert(store.samples(SensorType.Integer).columns.toSeq ==
      Seq("sensor_id", "timestamp_us", "value"))
  }

  test("streaming ingest lands samples in the store (at-least-once)") {
    val srcDir = tempDir()
    val store = new SensorStore(spark, tempDir())
    sampleData.write.mode("overwrite").parquet(srcDir)
    val q = StreamingIngest.ingestStream(
      spark, srcDir, sampleData.schema, store, SensorType.Float,
      tempDir() + "/ckpt")
    q.awaitTermination() // AvailableNow terminates when caught up
    assert(store.samples(SensorType.Float).count() == 3)
  }

  test("windowed resample (batch mode) aggregates per tumbling window") {
    val df = Seq(
      ("s1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1.0),
      ("s1", java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 3.0),
      ("s1", java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 5.0))
      .toDF("sensor_id", "ts", "value")
    val got = StreamingIngest.windowedResample(df, "1 hour", "1 hour")
      .orderBy("window_start_us")
      .select("n", "avg_value", "min_value", "max_value")
      .as[(Long, Double, Double, Double)].collect()
    assert(got.toSeq == Seq((2L, 2.0, 1.0, 3.0), (1L, 5.0, 5.0, 5.0)))
  }
}

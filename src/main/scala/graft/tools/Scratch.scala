package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.model.SensorType
import graft.store.SensorStore

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("scr_store").toString
    val store = new SensorStore(spark, root)
    store.publishSamples(SensorType.Float, Seq(
      ("s1", 1704067200000000L, 1.0), // 2024-01
      ("s1", 1706745600000000L, 2.0), // 2024-02
      ("s1", 1709251200000000L, 3.0)) // 2024-03
      .toDF("sensor_id", "timestamp_us", "value"))
    val withMonth = spark.read.parquet(s"$root/values_float")
    println("SCHEMA: " + withMonth.schema.simpleString)
    val pruned = withMonth
      .filter(col("timestamp_us") <= 1705000000000000L)
    println(pruned.queryExecution.executedPlan.toString.take(2000))
    val pruned2 = withMonth
      .filter(col("month") <= 202401 && col("timestamp_us") <= 1705000000000000L)
    println(pruned2.queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}

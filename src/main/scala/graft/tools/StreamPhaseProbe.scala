package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase breakdown of one streaming query's fixed cost. */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    (1 to 3).foreach { round =>
      println(s"round $round")
      val sp = sys.env.getOrElse("PROBE_STATE_PARTS", "4").toInt
      val ss = t("newSession") {
        graft.streaming.StreamingIngest.stateScopedSession(spark, sp) }
      val events = spark.read.parquet(s"$sfDir/events.parquet")
      val schema = events.schema
      // symlink dir for the file source
      val dir = graft.TempDirs.create("probe_src")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      val agg = t("plan") {
        val stream = ss.readStream.schema(schema).parquet(dir.toString)
        val s2 = (if (stream.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        else stream)
          .select(concat(col("event_type"), lit(" "), col("user_id"))
            .as("sensor_id"), col("ts"), col("value"))
        graft.streaming.StreamingIngest
          .windowedResample(s2, "1 day", "1 hour").drop("avg_value")
      }
      val name = s"probe_out_${System.nanoTime()}"
      val q = t("start") {
        agg.writeStream.outputMode("complete").format("memory")
          .queryName(name).start() }
      t("processAllAvailable") { q.processAllAvailable() }
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
      t("stop") { q.stop() }
      t("collect") { ss.table(name).collect() }
      ss.catalog.dropTempView(name)
      t("batch-equivalent") {
        (if (events.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
          events.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        else events)
          .select(concat(col("event_type"), lit(" "), col("user_id"))
            .as("sensor_id"), col("ts"), col("value"))
          .groupBy(col("sensor_id"), window(col("ts"), "1 day"))
          .agg(count(lit(1)).as("n"), min("value"), max("value"))
          .collect()
      }
      t("batch-equivalent-4part") {
        val s4 = spark.newSession()
        s4.conf.set("spark.sql.shuffle.partitions", "4")
        val ev4raw = s4.read.parquet(s"$sfDir/events.parquet")
        (if (ev4raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
          ev4raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        else ev4raw)
          .select(concat(col("event_type"), lit(" "), col("user_id"))
            .as("sensor_id"), col("ts"), col("value"))
          .groupBy(col("sensor_id"), window(col("ts"), "1 day"))
          .agg(count(lit(1)).as("n"), min("value"), max("value"))
          .collect()
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: replicate q32_stream_window's exact body with timers
  * around each phase and dump every micro-batch's durationMs breakdown
  * from recentProgress — the evidence for where the streaming family's
  * fixed overhead actually goes. Not part of the suite; run with
  *   sbt "Test/runMain graft.StreamProfileProbe 3"
  */
object StreamProfileProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = graft.streaming.StreamingIngest.stateScopedSession(spark, 4)
    // stage the source dir like streamSourceDir does
    val src = graft.TempDirs.create("probe_src")
    java.nio.file.Files.createSymbolicLink(
      src.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to reps).foreach { i =>
      println(s"=== run $i")
      val total0 = System.nanoTime()
      val stream = t("readStream") {
        ss.readStream.schema(schema).parquet(src.toString)
      }
      val streamSamples =
        (if (stream.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
          stream.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        else stream)
          .select(concat(col("event_type"), lit(" "), col("user_id"))
            .as("sensor_id"), col("ts"), col("value"))
      val agg = graft.streaming.StreamingIngest
        .windowedResample(streamSamples, "1 day", "1 hour")
        .drop("avg_value")
      val name = s"probe_out_${System.nanoTime()}"
      val query = t("start") {
        agg.writeStream.outputMode("complete")
          .format("memory").queryName(name).start()
      }
      t("processAllAvailable") { query.processAllAvailable() }
      t("stop") { query.stop() }
      val out = t("rematerialize") {
        val o = ss.table(name).orderBy("window_start_us", "sensor_id")
        val rows = java.util.Arrays.asList(o.collect(): _*)
        ss.catalog.dropTempView(name)
        spark.createDataFrame(rows, o.schema)
          .orderBy("window_start_us", "sensor_id")
      }
      t("count") { out.count() }
      println(f"  TOTAL ${(System.nanoTime() - total0) / 1e9}%.3f s")
      query.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} " +
          Option(p.stateOperators).map(_.toSeq.map(so =>
            s"stateOp(total=${so.numRowsTotal}, upd=${so.numRowsUpdated}, " +
            s"commitMs=${so.commitTimeMs})").mkString(" ")).getOrElse(""))
      }
    }
    // registry body (boundedResult path) for comparison, same JVM/load
    val fn = SparkEntry.queries("q32_stream_window")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"registry run $i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}

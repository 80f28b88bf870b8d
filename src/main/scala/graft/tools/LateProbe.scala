package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Probe: how many micro-batches does the q291 two-file source run,
  * and what does each batch see? Dev scaffolding only.
  */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val d = "/root/testdata/sf0.01"
    val root = graft.TempDirs.create("late_probe")
    val ev = Tables.load(spark, d, "events")
    def dump(parity: Int, name: String, mtimeMs: Long): Unit = {
      val tmp = root.resolve(s"${name}_tmp")
      ev.filter(col("event_id") % 3 === parity)
        .coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, root.resolve(name))
      java.nio.file.Files.setLastModifiedTime(root.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    dump(0, "0.parquet", 1000000000000L)
    dump(1, "1.parquet", 1000000060000L)
    dump(2, "2.parquet", 1000000120000L)

    val schema = ev.schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(root.toString)
    val stream =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    val agg = stream.withWatermark("ts", "30 minutes")
      .groupBy(col("event_type"), window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("probe").start()
    query.processAllAvailable()
    Thread.sleep(2000)
    query.processAllAvailable()
    query.recentProgress.foreach { p =>
      println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
        s"watermark=${p.eventTime.get("watermark")} " +
        s"stateRows=${Option(p.stateOperators).map(_.toSeq.map(s0 =>
          (s0.numRowsTotal, s0.numRowsDroppedByWatermark))).getOrElse(Nil)}")
    }
    query.stop()
    println("PROBE total emitted: " + spark.table("probe").count())
    spark.stop()
  }
}

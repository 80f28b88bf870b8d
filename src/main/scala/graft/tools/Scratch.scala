package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Temporary profiling harness — not part of the library surface. */
object Scratch {

  private final class PeakMeter extends SparkListener {
    val peak = new java.util.concurrent.atomic.AtomicLong()
    val memSpilled = new java.util.concurrent.atomic.AtomicLong()
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        peak.getAndAccumulate(m.peakExecutionMemory, Math.max)
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { peak.set(0); memSpilled.set(0); diskSpilled.set(0) }
  }

  /** Hot-key window-buffering probe (r17 verdict items 3/7): one
    * deliberately hot partition key at 100x-probe row counts, through
    * both trendOls shapes and newVsReturning. Records wall, peak task
    * execution memory and spill for the WindowExec-buffering question.
    */
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new PeakMeter
    spark.sparkContext.addSparkListener(meter)
    def barrier(): Unit =
      org.apache.spark.graft.ListenerBarrier.drain(spark.sparkContext)

    val n = 20000000L // 5M rows on the hot key, ~400 each on 50k others
    val base = 1700000000000000L
    val rows = spark.range(n).select(
      when(expr("id % 4 = 0"), lit("hot"))
        .otherwise(concat(lit("s"), expr("id % 50000"))).as("sensor_id"),
      (lit(base) + col("id")).as("timestamp_us"),
      (expr("(id % 997)") / 7.0).as("value"))

    def probe(label: String)(f: => Long): Unit = {
      barrier(); meter.reset()
      val t0 = System.nanoTime()
      val out = f
      barrier()
      println(f"SCRATCH $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  rows=$out%9d  peak_task_mem=${meter.peak.get() / 1048576}%5d MB" +
        f"  spill_mem=${meter.memSpilled.get() / 1048576}%6d MB" +
        f"  spill_disk=${meter.diskSpilled.get() / 1048576}%5d MB")
    }

    val variant = "window"
    probe(s"trendOls/$variant cold")(
      graft.pipeline.Profiler.trendOls(rows, "sensor_id", "timestamp_us",
        "value").count())
    probe(s"trendOls/$variant warm")(
      graft.pipeline.Profiler.trendOls(rows, "sensor_id", "timestamp_us",
        "value").count())

    // newVsReturning on a hot-customer order frame (shipped r16 window)
    val orders = spark.range(n).select(
      when(expr("id % 4 = 0"), lit(1L))
        .otherwise(expr("id % 500000")).as("custkey"),
      to_timestamp(from_unixtime(lit(1700000000L) + expr("id % 31536000")))
        .as("ts"),
      (expr("(id % 997)") / 7.0).as("amount"))
    probe("newVsReturning cold")(
      graft.pipeline.Behavior.newVsReturning(orders, "custkey", "ts",
        "amount").count())
    probe("newVsReturning warm")(
      graft.pipeline.Behavior.newVsReturning(orders, "custkey", "ts",
        "amount").count())

    spark.stop()
  }
}

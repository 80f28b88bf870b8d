package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale probe over a [[ScaleGen]] dataset (r13 verdict item #4): run
  * the headline pipeline families at ~sf1 and report seconds + shuffle
  * read/write bytes per query — the empirical backing for the
  * linear-in-rows claims the plan pins argue structurally. Compare
  * against the same probe at sf0.1: a family whose time or shuffle
  * volume grows super-linearly in rows (beyond the 10× data) is a
  * scale bug.
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleProbe <dataDir> [q24_ngram_jaccard,...]"
  * Output: one JSON line per query + a summary line.
  */
object ScaleProbe {

  /** ONE meter for the JVM's lifetime, read as before/after snapshots
    * with a listener-bus DRAIN BARRIER around each query
    * ([[org.apache.spark.graft.ListenerBarrier]]). The previous
    * per-query add/remove scheme mis-attributed under event-flood:
    * `AsyncEventQueue` delivers backlogged events (posted before
    * registration) to newly-added listeners, so a heavy query's late
    * stage completions landed in the NEXT query's meter (measured: a
    * 1-row audit query "inheriting" 700 MB of shuffle reads).
    * peakTaskMemory is reset between queries (single-threaded probe).
    */
  private final class ShuffleMeter extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong()
    val write = new java.util.concurrent.atomic.AtomicLong()
    // memory-pressure evidence (r15): spill totals say whether the
    // working set exceeded execution memory; peakTaskMemory (the MAX
    // single-task execution-memory peak) is the number that must stay
    // bounded for the 1000-executor story — a task whose peak grows
    // with total data size is the cliff
    val memSpilled = new java.util.concurrent.atomic.AtomicLong()
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong()
    val peakTaskMemory = new java.util.concurrent.atomic.AtomicLong()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpilled.addAndGet(m.memoryBytesSpilled)
        diskSpilled.addAndGet(m.diskBytesSpilled)
      }
    }
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null)
        peakTaskMemory.getAndAccumulate(m.peakExecutionMemory, Math.max)
    }
  }

  private final case class Snap(
      read: Long, write: Long, mem: Long, disk: Long)
  private def snap(m: ShuffleMeter): Snap =
    Snap(m.read.get(), m.write.get(), m.memSpilled.get(),
      m.diskSpilled.get())

  val DefaultQueries: Seq[String] = Seq(
    "q24_ngram_jaccard", "q25_minhash_lsh", "q57_dedup_clusters",
    "q134_semdedup", "q154_pq_topk", "q116_stream_interval_join",
    "q197_spearman")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ScaleProbe <dataDir> [q1,q2,...|--all] [--out <file>]")
    val dir = args(0)
    // index-based flag parsing ('--out' consumes its following token by
    // position) — same fix as PlanProbe: string-equality filtering
    // dropped positional args that equalled the --out value
    val (outFile, rest) = {
      var out: Option[String] = None
      val pos = Seq.newBuilder[String]
      var i = 1
      while (i < args.length) {
        if (args(i) == "--out" && i + 1 < args.length) {
          out = Some(args(i + 1)); i += 2
        } else { pos += args(i); i += 1 }
      }
      (out, pos.result())
    }
    val names =
      if (rest.contains("--all"))
        // the derived worklist (r15 verdict item 5): EVERY registry
        // query, not a hand-picked family subset
        graft.SparkEntry.queries.keys.toSeq.sorted
      else if (rest.nonEmpty) rest.head.split(",").toSeq
      else DefaultQueries
    val sink = outFile.map(f => new java.io.PrintWriter(
      new java.io.FileWriter(f, /*append=*/ false)))
    def emit(line: String): Unit = { println(line); sink.foreach { s =>
      s.println(line); s.flush() } }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    def barrier(): Unit =
      org.apache.spark.graft.ListenerBarrier.drain(spark.sparkContext)

    val results = names.flatMap { n =>
      barrier()
      val before = snap(meter)
      meter.peakTaskMemory.set(0L)
      val t0 = System.nanoTime()
      // per-query fault isolation: a query whose tables the probe draw
      // lacks reports and moves on instead of killing the whole probe.
      // keep the frame so its checkpoint blocks (dedup/ANN entries
      // materialize eagerly) are FREED after the count — an --all sweep
      // would otherwise pin hundreds of checkpoints for the JVM's life
      var built: org.apache.spark.sql.DataFrame = null
      val rowsOpt =
        try {
          built = graft.SparkEntry.queries(n)(spark, dir)
          Some(built.count())
        } catch {
          case e: Throwable =>
            emit(s"""{"query":"$n","error":"${
              PlanProbe.jsonEscape(String.valueOf(e.getMessage))}"}""")
            if (built != null) graft.pipeline.PipelineCache.free(built)
            None
        }
      rowsOpt.map { rows =>
        val sec = (System.nanoTime() - t0) / 1e9
        barrier()
        val after = snap(meter)
        graft.pipeline.PipelineCache.free(built)
        val (rd, wr) = (after.read - before.read, after.write - before.write)
        // raw byte counts too: MB truncation hides the growth ratio of
        // small-shuffle queries, which is exactly what ScaleGate diffs
        val line = f"""{"query":"$n","sec":$sec%.2f,"rows":$rows,""" +
          s""""shuffle_read_mb":${rd / 1048576},""" +
          s""""shuffle_write_mb":${wr / 1048576},""" +
          s""""shuffle_read_b":$rd,""" +
          s""""shuffle_write_b":$wr,""" +
          s""""mem_spilled_mb":${(after.mem - before.mem) / 1048576},""" +
          s""""disk_spilled_mb":${(after.disk - before.disk) / 1048576},""" +
          s""""peak_task_mem_mb":${meter.peakTaskMemory.get() / 1048576}}"""
        emit(line)
        (n, sec, rows, rd, wr)
      }
    }
    val total = results.map(_._2).sum
    emit(f"""{"probe_dir":"$dir","queries":${results.length},""" +
      f""""total_sec":$total%.1f}""")
    sink.foreach(_.close())
    spark.stop()
  }
}

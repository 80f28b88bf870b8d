package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Optimization-round measurement harness (guide §1): for each query,
  * run once cold + once warm, and report the WARM run's wall seconds
  * alongside the Spark-machinery counters that explain it — job count,
  * stage count, task count, shuffle read/write bytes — plus the
  * `.explain("formatted")` physical plan written to a file. The
  * counters answer "is this query slow because of data work or because
  * of plan machinery" (a 2 MB-input query spending 40 stages is
  * machinery), and the plan files are the before/after evidence for
  * OPTIMIZATION_r16.md / plans/r16.
  *
  * Usage:
  *   sbt "runMain graft.tools.PlanProbe <dataDir> <planOutDir> \
  *        [q1,q2,...|--all] [--out <file.jsonl>]"
  */
object PlanProbe {

  private final class Meter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val read = new java.util.concurrent.atomic.AtomicLong()
    val write = new java.util.concurrent.atomic.AtomicLong()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      tasks.incrementAndGet()
  }
  /** Minimal JSON string escape: backslash, quote, and all control
    * characters (a raw tab/newline in an exception message previously
    * produced an invalid JSONL line).
    */
  private[tools] def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private final case class Snap(
      jobs: Long, stages: Long, tasks: Long, read: Long, write: Long)
  private def snap(m: Meter): Snap =
    Snap(m.jobs.get(), m.stages.get(), m.tasks.get(), m.read.get(),
      m.write.get())

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PlanProbe <dataDir> <planOutDir> [q1,q2,...|--all] " +
        "[--out <file>]")
    val dir = args(0)
    val planDir = new java.io.File(args(1))
    planDir.mkdirs()
    // index-based flag parsing: '--out' consumes exactly its following
    // token by POSITION (the previous string-equality filter dropped any
    // positional arg that happened to equal the --out value)
    val (outFile, rest) = {
      var out: Option[String] = None
      val pos = Seq.newBuilder[String]
      var i = 2
      while (i < args.length) {
        if (args(i) == "--out" && i + 1 < args.length) {
          out = Some(args(i + 1)); i += 2
        } else { pos += args(i); i += 1 }
      }
      (out, pos.result())
    }
    val names =
      if (rest.contains("--all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else rest.headOption.map(_.split(",").toSeq)
        .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val sink = outFile.map(f => new java.io.PrintWriter(
      new java.io.FileWriter(f, false)))
    def emit(line: String): Unit = { println(line); sink.foreach { s =>
      s.println(line); s.flush() } }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    def barrier(): Unit =
      org.apache.spark.graft.ListenerBarrier.drain(spark.sparkContext)

    names.foreach { n =>
      try {
        // cold run (untimed here beyond wall): plan + codegen warmup
        val t0 = System.nanoTime()
        val df0 = graft.SparkEntry.queries(n)(spark, dir)
        df0.count()
        graft.pipeline.PipelineCache.free(df0)
        val cold = (System.nanoTime() - t0) / 1e9
        // warm run, metered
        barrier()
        val before = snap(meter)
        val t1 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val rows = df.count()
        val sec = (System.nanoTime() - t1) / 1e9
        barrier()
        val after = snap(meter)
        // Execute THIS DataFrame's own QueryExecution before explaining:
        // the timed count() above runs a SEPARATE grouped QueryExecution,
        // leaving df.queryExecution un-executed — its explain would print
        // the initial AdaptiveSparkPlan (isFinalPlan=false) and could miss
        // AQE runtime join-strategy switches. One extra untimed pass per
        // query buys the final plan.
        val plan =
          try {
            df.queryExecution.toRdd.foreach(_ => ())
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
          } catch { case e: Throwable => s"explain failed: $e" }
        graft.pipeline.PipelineCache.free(df)
        java.nio.file.Files.writeString(
          new java.io.File(planDir, s"$n.txt").toPath, plan)
        val nExch = "Exchange".r.findAllIn(plan).length
        emit(f"""{"query":"$n","warm_sec":$sec%.3f,"cold_sec":$cold%.3f,""" +
          s""""rows":$rows,"jobs":${after.jobs - before.jobs},""" +
          s""""stages":${after.stages - before.stages},""" +
          s""""tasks":${after.tasks - before.tasks},""" +
          s""""shuffle_read_b":${after.read - before.read},""" +
          s""""shuffle_write_b":${after.write - before.write},""" +
          s""""plan_exchanges":$nExch}""")
      } catch {
        case e: Throwable =>
          emit(s"""{"query":"$n","error":"${
            jsonEscape(String.valueOf(e.getMessage))}"}""")
      }
    }
    sink.foreach(_.close())
    spark.stop()
  }
}

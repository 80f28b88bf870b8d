package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: times the streaming-query family (cold + 3 warm) to
  * quantify the fixed micro-batch machinery cost and validate
  * checkpoint-placement changes. Not part of the driver contract.
  */
object StreamProbe {
  val family = Seq("q32_stream_window", "q74_stream_dedup",
    "q116_stream_interval_join", "q219_stream_cusum", "q275_stream_hll",
    "q284_stream_sessions", "q291_stream_late_data",
    "q296_stream_outer_join", "q313_stream_update_mode")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    val names = family.filter(qs.contains)
    def timed(n: String): Double = {
      val t0 = System.nanoTime()
      try {
        val df = qs(n)(spark, sfDir)
        df.count()
        graft.pipeline.PipelineCache.free(df)
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(timed) // cold
    val rounds = (1 to 3).map(_ => names.map(n => n -> timed(n)).toMap)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    var total = 0.0
    names.foreach { n =>
      val m = med(rounds.map(_(n)))
      total += m
      println(f"$n%-28s warm_med=$m%6.2f s samples=${rounds.map(_(n)).map(x => f"$x%.2f").mkString(",")}")
    }
    println(f"TOTAL warm median: $total%.2f s over ${names.length} queries")
    spark.stop()
  }
}

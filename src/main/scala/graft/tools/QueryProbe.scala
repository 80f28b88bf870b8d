package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: cold + 3-warm timing of an arbitrary query subset
  * (comma-separated names in GRAFT_PROBE_QUERIES). Not part of the
  * driver contract.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("GRAFT_PROBE_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach(n => require(qs.contains(n), s"unknown query $n"))
    def timed(n: String): Double = {
      val t0 = System.nanoTime()
      try {
        val df = qs(n)(spark, sfDir)
        df.count()
        graft.pipeline.PipelineCache.free(df)
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    val cold = names.map(n => n -> timed(n)).toMap
    val rounds = (1 to 3).map(_ => names.map(n => n -> timed(n)).toMap)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    var total = 0.0
    names.foreach { n =>
      val m = med(rounds.map(_(n)))
      total += m
      println(f"$n%-28s cold=${cold(n)}%6.2f warm_med=$m%6.2f " +
        s"samples=${rounds.map(_(n)).map(x => f"$x%.2f").mkString(",")}")
    }
    println(f"TOTAL warm median: $total%.2f s over ${names.length} queries")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: `runMain graft.tools.TimeQueries <sfDir>
  * <rounds> q...` runs each named query `rounds` times after one
  * untimed warmup and prints per-round samples plus the median —
  * the local feedback loop for single-query optimization without a
  * full Bench sweep. Reads /proc/loadavg before and after, like Bench,
  * so samples can be discarded under host load.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeQueries <sfDir> <rounds> <q>...")
    val sfDir = args(0)
    val rounds = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def loadavg(): String =
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()
      graft.pipeline.PipelineCache.free(df)
      (System.nanoTime() - t0) / 1e9
    }
    println(s"loadavg_start: ${loadavg()}")
    names.foreach { n =>
      timed(n) // warmup
      val samples = (1 to rounds).map(_ => timed(n))
      val med = samples.sorted.apply(samples.length / 2)
      println(f"$n: median=$med%.3f samples=${samples.map(s => f"$s%.3f")}")
    }
    println(s"loadavg_end: ${loadavg()}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: decompose the per-query warm floor into (a) DataFrame
  * construction (query-fn call: reads, plan building, analysis), and
  * (b) action execution, for a few representative queries. Run:
  * `sbt "runMain graft.tools.FloorProbe /root/testdata/sf0.1"`.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q1_agg", "q2_range_scan", "q22_text_stats",
      "q29_langid", "q41_promql_count_over_time", "q55_deterministic_sample",
      "q72_promql_math", "q81_arrow_typed")
    // warmup
    names.foreach { n =>
      val df = graft.Queries.all(n)(spark, sfDir); df.count()
      graft.pipeline.PipelineCache.free(df)
    }
    println(f"${"query"}%-28s construct  action   total")
    names.foreach { n =>
      var c = 0.0; var a = 0.0
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val df = graft.Queries.all(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        graft.pipeline.PipelineCache.free(df)
        c += (t1 - t0) / 1e9; a += (t2 - t1) / 1e9
      }
      println(f"$n%-28s ${c / 3}%9.3f ${a / 3}%7.3f ${(c + a) / 3}%7.3f")
    }
    // raw read cost: fresh spark.read.parquet per call vs reused plan
    val t0 = System.nanoTime()
    (1 to 20).foreach(_ => spark.read.parquet(s"$sfDir/events.parquet"))
    val t1 = System.nanoTime()
    println(f"spark.read.parquet avg: ${(t1 - t0) / 20e6}%.1f ms")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val t2 = System.nanoTime()
    (1 to 20).foreach(_ => df.rdd.getNumPartitions)
    val t3 = System.nanoTime()
    println(f"df.rdd.getNumPartitions avg: ${(t3 - t2) / 20e6}%.1f ms")
    spark.stop()
  }
}

package graft.tools

import graft.{GraftSession, Queries}

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("q14_asof_join", "q16_senml_roundtrip",
        "q20_gorilla_roundtrip", "q15_csv_roundtrip", "q38_csv_multi",
        "q34_arrow_roundtrip", "q19_promql", "q32_stream_window")) {
      println(s"SCRATCH >>> $name")
      Queries.all(name)(spark, d).count()
    }
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val d = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("q57_dedup_clusters")
    for (n <- names) {
      time(s"$n cold")(graft.Queries.all(n)(spark, d).count())
      time(s"$n warm")(graft.Queries.all(n)(spark, d).count())
    }
    println(s"SCRATCH persistent RDDs after: " +
      spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}

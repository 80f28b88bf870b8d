package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.pipeline.Similarity

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

    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
      .cache()
    println(s"SCRATCH corpus ${e.count()} dim ${e.select(size(col("vec"))).first().getInt(0)}")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))

    val cs = time("ivfCentroids(8, iters=2)") {
      Similarity.ivfCentroids(e, 8, 2)
    }
    time("assign corpus (count)") {
      e.withColumn("cid", Similarity.nearestCentroid(col("vec"), cs))
        .groupBy("cid").count().collect()
    }
    time("full ivfTopK") {
      Similarity.ivfTopK(queries, e, 5, nlist = 8, nprobe = 4).count()
    }
    time("full ivfTopK (2nd)") {
      Similarity.ivfTopK(queries, e, 5, nlist = 8, nprobe = 4).count()
    }
    spark.stop()
  }
}

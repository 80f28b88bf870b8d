package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.pipeline.{Dedup, TextAnalysis}

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

    val docs = Tables.documents(spark, d).cache()
    println(s"SCRATCH docs ${docs.count()}")

    val g = docs.select(col("doc_id").as("id"),
      explode(TextAnalysis.shingles(
        TextAnalysis.whitespaceTokens(col("text")), 3)).as("sh"))
    time("shingle table count")(g.count())
    time("signatures k=32") {
      Dedup.minHashSignatureArrays(docs, "doc_id", "text", 3, 32).count()
    }
    time("lsh full") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5, 32, 8).count()
    }
    time("lsh full (2nd)") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5, 32, 8).count()
    }
    time("ngram jaccard") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("simhash full") {
      Dedup.simHashPairs(docs, "doc_id", "text", 16).count()
    }
    spark.stop()
  }
}

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
        TextAnalysis.whitespaceTokens(col("text")), 3)).as("sh")).cache()
    time("shingle table count")(g.count())
    // stage breakdown of minHashLshPairs(32, 8)
    val sigs = time("signatures k=32") {
      val s = Dedup.minHashSignatureArrays(docs, "doc_id", "text", 3, 32).cache()
      s.count(); s
    }
    val bandHashes = sigs.select(col("id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64(slice(col("sig"), b * 4 + 1, 4))): _*))
        .as(Seq("band", "band_hash"))).cache()
    time("band hashes")(bandHashes.count())
    val candidates = time("candidate join") {
      val c = bandHashes.as("a").join(bandHashes.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_hash") === col("b.band_hash") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct().cache()
      println(s"SCRATCH candidates ${c.count()}")
      c
    }
    time("verification") {
      val candIds = candidates
        .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
      val gc = g.join(candIds, Seq("id"), "left_semi")
      val sizes = gc.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
      val common = gc.as("ga").join(candidates, col("ga.id") === col("id_a"))
        .join(gc.as("gb"),
          col("gb.id") === col("id_b") && col("ga.sh") === col("gb.sh"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
        .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
        .filter(col("jaccard") >= 0.5)
        .count()
    }
    time("lsh full (warm)") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5, 32, 8).count()
    }
    spark.stop()
  }
}

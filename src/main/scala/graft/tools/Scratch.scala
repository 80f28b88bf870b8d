package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    for (d <- Seq("/root/testdata/sf0.1", "/tmp/graft_m100")) {
      val docs = graft.Tables.spread(spark, graft.Tables.documents(spark, d))
      val toks = docs.select(col("doc_id").as("id"),
        explode(graft.pipeline.TextAnalysis.whitespaceTokens(
          lower(col("text")))).as("token"))
      val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("cu")).cache()
      val nVocab = uni.count()
      val uniBytes = uni.queryExecution.optimizedPlan.stats.sizeInBytes
      val big = toks
        .withColumn("prev", lag(col("token"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("id")).orderBy(col("id"))))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("token")).agg(count(lit(1)).as("cb"))
        .cache()
      val nBig = big.count()
      val bigBytes = big.queryExecution.optimizedPlan.stats.sizeInBytes
      println(s"SCRATCH $d vocab_rows=$nVocab vocab_mem_bytes=$uniBytes " +
        s"bigram_rows=$nBig bigram_mem_bytes=$bigBytes")
      uni.unpersist(); big.unpersist()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the connected-components loop: builds a high-degree
  * fixture (cliques + one chain), runs one propagation round by hand,
  * and prints the executed plan plus per-stage shuffle-write records —
  * the evidence for whether the cached edge table's partitioning is
  * actually reused by the per-round join or re-shuffled every round.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8))
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val chain = (0L until 63L).map(i => (i, i + 1))
    val pairs = (0 until 20000).map(i => (1000L + 2 * i, 1001L + 2 * i))
    val edges = (chain ++ pairs).toDF("id_a", "id_b")
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("dst"))
      .cache()
    println(s"sym rows: ${sym.count()}")
    val labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster_id"))
      .localCheckpoint(true)
    val prop = sym
      .join(labels.select(col("id").as("dst"), col("cluster_id")), "dst")
      .groupBy(col("src").as("id"))
      .agg(min(col("cluster_id")).as("__nl"))
    prop.count()
    println("=== PROP EXECUTED PLAN ===")
    println(prop.queryExecution.executedPlan.toString)

    // full-loop job census on the same fixture
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val nodes = edges.select(col("id_a").as("id"))
      .union(edges.select(col("id_b").as("id"))).distinct()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val (cc, rounds) =
      graft.pipeline.Dedup.connectedComponentsWithRounds(nodes, edges)
    cc.count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"rounds=$rounds jobs=${jobs.get()} wall=$dt%.2fs")
    spark.stop()
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared, persisted dedup artifacts — the warehouse layer between a
  * corpus and its dedup consumers. The near-dup pair graph over a
  * corpus is (a) expensive (shingle explode + inverted-index self-join
  * — the dominant cost of every clustering query) and (b) identical
  * for every consumer at the same (n, tau); clustering, keep-best,
  * survivorship, and audit queries each rebuilt and re-shuffled it per
  * run. This object computes it ONCE per (session, corpus, params) and
  * persists it through [[graft.store.Bucketing]] as a dst-bucketed,
  * bucket-sorted parquet table, so every consumer — and every ROUND of
  * the CC label loop — reads the layout with ZERO Exchange on the edge
  * side (PlanSpec-pinned). This is the pre-shuffle a 100 TB pipeline
  * pays at artifact-build time instead of on every query: on a real
  * cluster the table lives in the metastore next to the corpus and
  * survives the session; here it lives for the JVM like Tables'
  * relation cache.
  */
object DedupArtifacts {

  private val symTables =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]()
  private val ctr = new java.util.concurrent.atomic.AtomicLong()

  /** Default bucket count: enough for bucket-parallel reads of a pair
    * graph that is orders of magnitude smaller than its corpus; a real
    * deployment sizes this with the corpus (buckets ≈ edge rows /
    * target partition rows).
    */
  val DefaultBuckets = 8

  /** The symmetric, self-loop-augmented near-dup pair graph of `docs`
    * at (n, tau), as a dst-bucketed persisted table with schema
    * (src, dst, jaccard): every edge in both directions carrying its
    * exact Jaccard score, plus one (id, id, null) row per edge-incident
    * node — exactly the invariants
    * [[Dedup.connectedComponentsPreBucketed]] requires, and the scored
    * pair surface q24-style reports read directly. `corpusKey`
    * identifies the corpus (e.g. its directory); the artifact is built
    * on first use per (session, corpusKey, n, tau) and served from the
    * bucketed layout afterwards.
    */
  def symEdgeTable(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, corpusKey: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val spark = docs.sparkSession
    // purge stopped-session entries (PipelineCache.pinsFor doctrine)
    symTables.keySet.removeIf(_._1.sparkContext.isStopped)
    symTables.computeIfAbsent(
      (spark, s"$corpusKey|$idCol|$textCol|$n|$tau|$buckets"), _ => {
        val pairs = Dedup.ngramJaccardPairs(docs, idCol, textCol, n, tau)
          .select("id_a", "id_b", "jaccard")
        val symRaw = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"),
            col("jaccard"))
          .union(pairs.select(col("id_b").as("src"),
            col("id_a").as("dst"), col("jaccard")))
        val selfLoops = symRaw.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst"),
            lit(null).cast("double").as("jaccard"))
        val name = s"graft_dedup_sym_${ctr.incrementAndGet()}"
        val path = graft.TempDirs.createPath("graft_dedup_sym")
        graft.store.Bucketing.writeBucketed(
          symRaw.union(selfLoops), name, "dst", buckets, s"$path/$name")
        PipelineCache.free(pairs)
        spark.table(name)
      })
  }

  /** The CANONICAL (id_a < id_b) scored pair view of
    * [[symEdgeTable]] — the q24-style near-dup pair report, served
    * from the shared layout instead of a fresh inverted-index join.
    */
  def scoredPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, corpusKey: String): DataFrame =
    symEdgeTable(docs, idCol, textCol, n, tau, corpusKey)
      .filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"),
        col("jaccard"))
}

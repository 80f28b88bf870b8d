package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared, persisted dedup artifacts — the warehouse layer between a
  * corpus and its dedup consumers. The near-dup pair graph over a
  * corpus is (a) expensive (shingle explode + inverted-index self-join
  * — the dominant cost of every clustering query) and (b) identical
  * for every consumer at the same (n, tau); clustering, keep-best,
  * survivorship, and audit queries each rebuilt and re-shuffled it per
  * run. This object computes it ONCE per (corpus fingerprint, params) and
  * persists it through [[graft.store.Bucketing]] as a dst-bucketed,
  * bucket-sorted parquet table, so every consumer — and every ROUND of
  * the CC label loop — reads the layout with ZERO Exchange on the edge
  * side (PlanSpec-pinned). This is the pre-shuffle a 100 TB pipeline
  * pays at artifact-build time instead of on every query: the table
  * persists through [[ArtifactWarehouse]] (manifest + bucketed
  * parquet), so a FRESH session — or a fresh JVM with a configured
  * warehouse root — re-registers and reuses it instead of rebuilding.
  */
object DedupArtifacts {

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
    * on first use per (corpus fingerprint, corpusKey, n, tau) and
    * served from the persisted bucketed layout afterwards — across
    * sessions.
    */
  def symEdgeTable(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, tau: Double, corpusKey: String,
      buckets: Int = 0): DataFrame = {
    // buckets <= 0 = census-sized from the corpus input bytes (see
    // ArtifactWarehouse.bucketsFor) — fixed counts make per-bucket
    // write tasks grow linearly with the corpus
    val b =
      if (buckets > 0) buckets
      else ArtifactWarehouse.bucketsFor(docs, DefaultBuckets)
    val fp = ArtifactWarehouse.fingerprint(docs,
      s"dedup_sym|$corpusKey|$idCol|$textCol|$n|$tau|$b")
    ArtifactWarehouse.bucketed(
        docs.sparkSession, "dedup_sym", fp, "dst", b) {
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
      // the build frame is handed to the warehouse writer; its internal
      // checkpoint is released here (the warehouse serves the TABLE)
      try symRaw.union(selfLoops).localCheckpoint(true)
      finally PipelineCache.free(pairs)
    }
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

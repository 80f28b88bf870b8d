package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared graph artifacts — the [[DedupArtifacts]] idea applied to the
  * co-occurrence graph family: the ≥minCount co-purchase edge set is
  * the expensive basket self-join every graph query (triangles,
  * k-core, …) pays identically; compute it once per (session, corpus,
  * params) and serve the MATERIALIZED frame (eager localCheckpoint —
  * small, bounded by the pair-count cut, pinned for the JVM like
  * Tables' relation cache). On a real cluster this is the persisted
  * edge table a graph pipeline maintains next to its fact table.
  */
object GraphArtifacts {

  private val edgeTables =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]()

  /** [[Behavior.coOccurrenceEdges]] of `events`, materialized once per
    * (session, corpusKey, cols, minCount). Output: (id_a, id_b),
    * canonical a < b.
    */
  def coOccurrenceEdges(
      events: DataFrame, userCol: String, itemCol: String,
      minCount: Long, corpusKey: String): DataFrame = {
    val spark = events.sparkSession
    // purge stopped-session entries (PipelineCache.pinsFor doctrine)
    edgeTables.keySet.removeIf(_._1.sparkContext.isStopped)
    edgeTables.computeIfAbsent(
      (spark, s"$corpusKey|$userCol|$itemCol|$minCount"),
      _ => PipelineCache.pin(
        Behavior.coOccurrenceEdges(events, userCol, itemCol, minCount)
          .localCheckpoint(true)))
  }
}

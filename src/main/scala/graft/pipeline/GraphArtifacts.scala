package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Shared graph artifacts — the [[DedupArtifacts]] idea applied to the
  * co-occurrence graph family: the ≥minCount co-purchase edge set is
  * the expensive basket self-join every graph query (triangles,
  * k-core, …) pays identically; compute it once per (corpus
  * fingerprint, params) and serve it from [[ArtifactWarehouse]]
  * parquet (small, bounded by the pair-count cut) — the persisted edge
  * table a graph pipeline maintains next to its fact table, surviving
  * the session.
  */
object GraphArtifacts {

  /** [[Behavior.coOccurrenceEdges]] of `events`, materialized once per
    * (corpus fingerprint, cols, minCount) and persisted through
    * [[ArtifactWarehouse]] — a fresh session reads the parquet back
    * instead of repaying the basket self-join. Output: (id_a, id_b),
    * canonical a < b — layout-independent integers, so the persisted
    * read is value-identical to the inline build.
    */
  def coOccurrenceEdges(
      events: DataFrame, userCol: String, itemCol: String,
      minCount: Long, corpusKey: String): DataFrame = {
    val fp = ArtifactWarehouse.fingerprint(events,
      s"graph_cooc|$corpusKey|$userCol|$itemCol|$minCount")
    ArtifactWarehouse.plain(events.sparkSession, "graph_cooc", fp) {
      Behavior.coOccurrenceEdges(events, userCol, itemCol, minCount)
    }
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Cache hygiene for the pipeline family.
  *
  * The dedup/similarity ops share internal frames (shingle tables,
  * signatures, candidate sets) across several consuming subplans, so they
  * persist those frames while building the answer. At corpus scale an
  * unbounded cache lifetime pins executor storage until LRU eviction
  * fights the shuffle for memory, so every op here follows one
  * discipline: materialize the (threshold-bounded) RESULT as an eager
  * local checkpoint, then unpersist every internal frame in `finally`.
  * The only storage a call leaves behind is the result's own checkpoint
  * — release it with [[free]] once the frame has been consumed.
  */
object PipelineCache {

  // checkpoint RDDs owned by a session-lifetime artifact cache
  // (GraphArtifacts, SimilarityArtifacts): [[free]] must not release
  // them even when a consumer returns the artifact frame directly in
  // its answer plan — the next consumer reads the same blocks.
  // Keyed per SparkContext, NOT a raw-id set: RDD ids restart from 0
  // in a fresh context, so ids pinned by a dead context would
  // otherwise suppress free() for unrelated checkpoints after a
  // context restart in the same JVM — silently re-introducing the
  // block leak free() exists to prevent. A stopped context's entry is
  // dropped on the next pin/free touch (the map stays O(live
  // contexts): one per JVM in practice).
  private val pinned = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.SparkContext,
    java.util.Set[Int]]()

  private def pinsFor(
      sc: org.apache.spark.SparkContext): java.util.Set[Int] = {
    pinned.keySet.removeIf(_.isStopped)
    // never (re-)insert a stopped context: a free() arriving after
    // session teardown would otherwise strongly retain the dead
    // context's whole object graph in the map until the next touch
    if (sc.isStopped) java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    else pinned.computeIfAbsent(sc,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[Int]())
  }

  /** Mark `df`'s checkpoint blocks as session-lifetime: [[free]] skips
    * them. For the shared artifact caches, whose frames outlive any one
    * consuming query.
    */
  private[graft] def pin(df: DataFrame): DataFrame = {
    val pins = pinsFor(df.sparkSession.sparkContext)
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => pins.add(l.rdd.id); ()
      case _ => ()
    }
    df
  }

  /** Unpersist the local-checkpoint blocks backing `df` (no-op for plans
    * without checkpointed leaves; [[pin]]ned artifact blocks are
    * skipped). Call only after the frame has been fully consumed:
    * checkpoints truncate lineage, so a freed frame cannot be
    * recomputed.
    */
  def free(df: DataFrame): Unit = {
    val pins = pinsFor(df.sparkSession.sparkContext)
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD if !pins.contains(l.rdd.id) =>
        l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Eagerly checkpoint `result`, then unpersist `temps` — the shared
    * materialize-then-free shape of the pair/cluster ops. The checkpoint
    * runs while the temps are still cached (that is what they are for);
    * the `finally` guarantees the temps are released even when the
    * materializing job fails.
    */
  private[graft] def materialize(temps: DataFrame*)(result: DataFrame): DataFrame =
    try result.localCheckpoint(true)
    finally temps.foreach(_.unpersist(false))
}

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

  /** Unpersist the local-checkpoint blocks backing `df` (no-op for
    * plans without checkpointed leaves). Call only after the frame has
    * been fully consumed: checkpoints truncate lineage, so a freed
    * frame cannot be recomputed. (The session-lifetime "pin" escape
    * hatch is gone: the shared artifact caches now serve PERSISTED
    * tables through [[ArtifactWarehouse]], so no checkpoint blocks
    * outlive their building query anymore.)
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
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

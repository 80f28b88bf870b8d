package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: greedily fill
  * token-budgeted packs with whole documents, the standard step between
  * a filtered corpus and a trainer's fixed-length batches.
  */
object Packing {

  /** Greedy first-overflow packing, sharded for scale. Documents are
    * assigned deterministically to `shards` streams (`id % shards`);
    * within each stream, docs are taken in id order and accumulated
    * into the current pack until the NEXT doc would overflow `budget`
    * tokens, which opens a new pack. A document larger than the budget
    * gets a pack of its own (never dropped — the caller's length filter
    * is a separate policy decision).
    *
    * Packing is sequential by nature within a stream; SHARDING is what
    * makes it distributed: streams pack in parallel after one shuffle
    * on the shard key, each with O(1) state, and pack identity
    * (shard, pack_seq) is deterministic under any cluster layout or
    * input partitioning. More shards = more parallelism and marginally
    * more padding waste (one partially-filled tail pack per shard) —
    * the knob a 100 TB run sets to its executor count.
    *
    * Output: one row per document — (id, n_tokens, shard, pack_seq).
    */
  def greedyPack(
      docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    require(budget >= 1, "token budget must be positive")
    require(shards >= 1, "need at least one shard")
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (shard, it) =>
        val rows = it.toArray.sortBy(_._1)
        var seq = 0L
        var used = 0L
        rows.iterator.map { case (id, n, _) =>
          if (used > 0 && used + n > budget) { seq += 1; used = 0L }
          used += n
          (id, n, shard, seq)
        }
      }
      .toDF("id", "n_tokens", "shard", "pack_seq")
  }
}

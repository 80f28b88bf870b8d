package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy key skew: when a single join key carries
  * more rows than one shuffle partition holds, sort-merge degenerates
  * to one straggler task and AQE's skew splitting cannot help (it
  * splits PARTITIONS, not keys — a single key's rows still meet in one
  * task). Salting splits the KEY: hot keys (left-side frequency above
  * `hotThreshold`) get a content-derived salt in [0, salts) on the fact
  * side and `salts` replicated copies on the dim side, so one hot key's
  * rows spread across `salts` tasks; cold keys keep salt 0 and pay
  * nothing. The join output is identical to the unsalted join — the
  * salt never surfaces.
  *
  * The hot-key census is one map-side-combined count whose output is
  * the (tiny) hot-key set, materialized ONCE via an eager local
  * checkpoint and reused by every consumer — the routing decision, the
  * fact-side salt assignment and the dim-side replication all read the
  * same blocks instead of re-running the count. A production
  * deployment would seed [[hotKeyCensus]] from persisted table
  * statistics instead; the census is the stateless fallback, and
  * [[joinWithCensus]] accepts any precomputed census so several joins
  * against the same fact table share one. Dim-side replication
  * multiplies only the HOT dim rows by `salts`, so its cost is
  * |hot keys| × salts rows.
  */
object SaltedJoin {

  /** Left-side keys hotter than `hotThreshold`, as a broadcastable
    * (key, __hot) frame: one map-side-combined count. Deliberately NOT
    * checkpointed here — within a single join plan the two broadcast
    * consumers already share one physical exchange (ReusedExchange),
    * so a checkpoint would only add a job; [[autoJoin]] checkpoints
    * lazily where reuse genuinely crosses jobs (the routing action and
    * the join), and multi-join callers hold their own reference via
    * [[joinWithCensus]].
    */
  def hotKeyCensus(
      left: DataFrame, key: String, hotThreshold: Long): DataFrame = {
    require(hotThreshold >= 1, "hotThreshold must be positive")
    left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))
  }

  /** @param left  fact side carrying the skew; all columns survive
    * @param right dim side; non-key columns must not collide with left's
    * @param salts fan-out per hot key (2..shuffle-partitions is sane)
    * @param hotThreshold left-side row count above which a key is salted
    * @return inner join of left and right on `key`, exactly as
    *         `left.join(right, key)` would produce
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      hotThreshold: Long): DataFrame =
    joinWithCensus(left, right, key, salts,
      hotKeyCensus(left, key, hotThreshold))

  /** [[join]] against a PRECOMPUTED hot-key census (any (key, __hot)
    * frame — [[hotKeyCensus]] output, or a projection of persisted
    * table statistics): several joins against the same skewed fact
    * table pay for the census once.
    */
  def joinWithCensus(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      census: DataFrame): DataFrame = {
    require(salts >= 2, "salting below 2 is a no-op; use a plain join")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    val hot = census.select(col(key), col("__hot"))
    // content-derived salt: deterministic, and independent of
    // partitioning (identical duplicate rows share a salt — acceptable,
    // duplicates of one row are bounded by the row's multiplicity)
    val l = left.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull,
          pmod(xxhash64(left.columns.map(col): _*), lit(salts.toLong))
            .cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val r = right.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull,
          sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
      .drop("__hot")
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** The engine's routing entry point: run (or reuse) the hot-key
    * census and pick the join shape it justifies — the PLAIN join when
    * no key crosses `hotThreshold` (zero replication, zero salt
    * columns, the exact `left.join(right, key)` plan Catalyst would
    * optimize anyway), the salted join reusing the SAME census blocks
    * when at least one does. Output is identical either way; only the
    * physical shape changes.
    */
  def autoJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 8,
      hotThreshold: Long): DataFrame = {
    require(salts >= 2, "salting below 2 is a no-op; use a plain join")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    // lazy checkpoint: the routing action below materializes the (tiny)
    // hot-key blocks once; the salted join then reads the SAME blocks
    // instead of re-running the census aggregate
    val census = hotKeyCensus(left, key, hotThreshold).localCheckpoint(false)
    if (census.isEmpty) left.join(right, key)
    else joinWithCensus(left, right, key, salts, census)
  }

  /** [[autoJoin]] with the hot threshold DERIVED from the measured key
    * distribution instead of caller-supplied — the closed loop from
    * skew diagnosis ([[graft.pipeline.Profiler.skewProfile]]) to
    * routing: a key is hot when its row count exceeds `safetyFactor`
    * times a fair shuffle partition's share of the fact table
    * (total / shuffle partitions) — equivalently, when skewProfile's
    * `hot_ratio` for the key exceeds `safetyFactor · distinct / parts`.
    * Below that a sort-merge task already holds more than one such
    * key's rows, so splitting the key cannot shorten the critical path;
    * above it the key alone outweighs a fair task and AQE (which splits
    * partitions, never keys) is structurally unable to help.
    *
    * One grouped count is measured and materialized lazily; the totals
    * action fills its (distinct-key-sized) blocks, and the hot filter
    * and routing decision read the same blocks — the fact table is
    * scanned exactly as often as [[autoJoin]] scans it (once for the
    * census, once as the join side), the delta is only that the
    * materialized census is key-count-sized rather than hot-set-sized.
    * A production deployment with persisted table statistics can skip
    * the measurement and call [[joinWithCensus]] directly.
    */
  def autoJoinProfiled(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 8,
      safetyFactor: Double = 2.0): DataFrame = {
    require(salts >= 2, "salting below 2 is a no-op; use a plain join")
    require(safetyFactor > 0, "safetyFactor must be positive")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    val parts =
      left.sparkSession.sessionState.conf.numShufflePartitions.toLong
    val counts = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .localCheckpoint(false)
    val totalRow = counts.agg(sum(col("__n"))).first()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    if (total == 0L) left.join(right, key) // empty fact side
    else {
      val threshold =
        math.max(1L, math.ceil(safetyFactor * total / parts).toLong)
      val census = counts.filter(col("__n") > threshold)
        .select(col(key), lit(true).as("__hot"))
      if (census.isEmpty) left.join(right, key)
      else joinWithCensus(left, right, key, salts, census)
    }
  }
}

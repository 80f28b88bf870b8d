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
  * the distinct-key set (broadcast); a production deployment would
  * reuse table statistics instead of re-counting per join — the census
  * is the stateless fallback. Dim-side replication multiplies only the
  * HOT dim rows by `salts`, so its cost is |hot keys| × salts rows.
  */
object SaltedJoin {

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
      hotThreshold: Long): DataFrame = {
    require(salts >= 2, "salting below 2 is a no-op; use a plain join")
    require(hotThreshold >= 1, "hotThreshold must be positive")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
      .select(col(key), lit(true).as("__hot"))
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
}

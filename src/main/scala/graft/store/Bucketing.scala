package graft.store

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for shuffle-free co-located joins — the
  * pre-shuffle a 100 TB pipeline pays ONCE at write time instead of on
  * every join: both sides hash-bucketed (and sorted) on the join key
  * into the same bucket count meet bucket-to-bucket, so the join plans
  * with ZERO Exchange (pinned in PlanSpec). This is Spark's native
  * answer to the reference's per-backend physical table layout
  * (reference: src/storage/ per-backend DDL) — the layout lives in the
  * catalog, Catalyst exploits it automatically.
  *
  * Use for dimension/fact pairs that join repeatedly on a stable key;
  * the [[SensorStore]] parquet layout stays the general-purpose store
  * (bucketing requires the table catalog, not bare directories).
  */
object Bucketing {

  /** Write `df` as a bucketed external parquet table, hash-partitioned
    * AND sorted per bucket on `key`. Readers via `spark.table(name)`
    * see the bucket spec; joins between tables bucketed on the same key
    * with the same `buckets` count skip both the shuffle and (with
    * sorted buckets) the sort.
    */
  def writeBucketed(
      df: DataFrame, name: String, key: String, buckets: Int,
      path: String): Unit = {
    require(buckets > 0, "bucket count must be positive")
    // pre-shuffle to the bucket hash (repartition and bucketBy share
    // murmur3-pmod), so each task owns exactly one bucket and each
    // bucket is ONE file — the layout readers can treat as sorted
    // (multi-file buckets forfeit the sort guarantee and re-Sort under
    // SMJ even though the shuffle is still skipped)
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }
}

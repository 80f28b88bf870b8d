package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog application — the MERGE-style reduction every
  * incremental pipeline runs to roll a change stream into a snapshot
  * (Delta MERGE, Hudi upsert, Paimon changelog compaction):
  * per key, the LATEST change wins; a winning upsert replaces (or
  * inserts) the row, a winning delete removes it, untouched snapshot
  * rows carry over.
  *
  * "Latest" is the lexicographic max of (ts, op, payload...) — an
  * aggregate-expressible total order, so the per-key winner comes from
  * ONE `max(struct(...))` shuffle with map-side combine (never a
  * window over the change history, whose partition would hold a key's
  * full history). Equal-timestamp ties resolve by the op string
  * ('upsert' > 'delete' alphabetically — an upsert racing a delete at
  * the same instant keeps the row) and then by payload, making the
  * result a pure function of the change SET.
  *
  * Scale shape: one keyed aggregate over the changes, one full-outer
  * join against the snapshot on the same key (co-partitioned after
  * the aggregate's shuffle), one codegen'd projection. Nothing is
  * O(history) past the map-side combine.
  */
object Changelog {

  /** @param snapshot    current table: (key, payload...)
    * @param changes     change stream: (key, ts, op, payload...) with
    *                    op ∈ {"upsert", "delete"}
    * @param keyCol      merge key
    * @param tsCol       change ordering column
    * @param opCol       operation column
    * @param payloadCols snapshot payload columns (present in both)
    */
  def apply(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "at least one payload column")
    val winner = changes
      .groupBy(col(keyCol).as("__k"))
      .agg(max(struct(
        (col(tsCol).as("__ts") +: col(opCol).as("__op") +:
          payloadCols.map(c => col(c).as(s"__p_$c"))): _*)).as("__c"))
    snapshot
      .select(col(keyCol).as("__k") +:
        payloadCols.map(c => col(c).as(s"__s_$c")): _*)
      .join(winner, Seq("__k"), "full")
      // drop keys whose latest change is a delete; keep snapshot-only
      // rows (null change) and upsert winners
      .filter(col("__c").isNull || col("__c.__op") === "upsert")
      .select(col("__k").as(keyCol) +: payloadCols.map(c =>
        when(col("__c").isNotNull, col(s"__c.__p_$c"))
          .otherwise(col(s"__s_$c")).as(c)): _*)
  }
}

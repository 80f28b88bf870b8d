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

  /** Slowly-changing-dimension type-2 history build: roll a change
    * stream into versioned rows [valid_from, valid_to) per key — the
    * dimension-table shape every warehouse keeps for "what was this
    * attribute worth at time t" joins (Kimball SCD2; Delta/Hudi
    * point-in-time tables).
    *
    * Semantics: per (key, ts) the lexicographic-max payload wins (the
    * [[apply]] total order, so simultaneous writes resolve
    * deterministically); consecutive versions with identical payloads
    * collapse into one validity interval; the open current version has
    * `valid_to = NULL`. `version` numbers the key's surviving intervals
    * from 1 in time order.
    *
    * Scale shape: one keyed aggregate collapses each (key, ts) group
    * map-side, then ONE window pass per key (LAG to drop no-change
    * rows, LEAD + ROW_NUMBER on the change points) — the window
    * partition holds a key's distinct-timestamp count, not its event
    * count, and both windows share one (key, ts) sort.
    */
  def scd2History(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(valueCols.nonEmpty, "at least one value column")
    val payload = struct(valueCols.map(c => col(c).as(c)): _*)
    val perTs = changes
      .groupBy(col(keyCol).as("__k"), col(tsCol).as("__ts"))
      .agg(max(payload).as("__v"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__ts"))
    val points = perTs
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      // keep the first row and every payload change; `<=>` is
      // null-safe so the first row (null __prev) never equals
      .filter(!(col("__v") <=> col("__prev")))
    points
      .withColumn("valid_to", lead(col("__ts"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(Seq(col("__k").as(keyCol), col("version"),
        col("__ts").as("valid_from"), col("valid_to")) ++
        valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }

  /** Temporal validity (point-in-time) join: each fact row enriched
    * with the [[scd2History]] version that was current at the fact's
    * timestamp — `valid_from <= ts` and (`ts < valid_to` or the version
    * is open). The lookup every time-travelling dimension read compiles
    * to; facts before a key's first version drop (inner semantics).
    *
    * Scale shape: a plain EQUI-join on the key with the interval test
    * as a post-filter — correct to hash on because each fact meets at
    * most the key's version count (bounded by change frequency, not
    * fact count), and each fact survives against EXACTLY one version
    * (intervals partition the timeline).
    */
  def validityJoin(
      facts: DataFrame,
      history: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val overlap = (facts.columns.toSet & history.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, both sides have: $overlap")
    facts.join(history, Seq(keyCol))
      .filter(col("valid_from") <= col(tsCol) &&
        (col("valid_to").isNull || col(tsCol) < col("valid_to")))
  }
}

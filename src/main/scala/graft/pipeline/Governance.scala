package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-governance operators: deterministic masking for export
  * surfaces and privacy audits over quasi-identifiers — the
  * compliance steps between an analytics store and anything that
  * leaves it. All scan-stage expressions (masking) or plain
  * aggregates (audits): nothing here shuffles more than a groupBy.
  */
object Governance {

  /** Masking policies, all DETERMINISTIC (joinable across exports,
    * replayable off-engine — no salt-less randomness):
    *  - [[hashMask]]: 60-bit salted md5 surrogate (the
    *    pseudonymization standard — referential integrity preserved,
    *    original unrecoverable without the salt);
    *  - [[partialMask]]: keep a prefix, star the rest (human-readable
    *    redaction for support UIs);
    *  - [[bandMask]]: quantize a numeric to its band floor
    *    (generalization — the k-anonymity lever).
    */
  def hashMask(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  def partialMask(c: Column, keep: Int): Column =
    concat(substring(c.cast("string"), 1, keep),
      regexp_replace(substring(c.cast("string"), keep + 1, 1000000),
        ".", "*"))

  /** Band floor (generalization — the k-anonymity lever): quantize a
    * numeric to its band's lower edge. Spark's DIV truncates toward
    * zero while floor-division engines (DuckDB `//`) floor, so the
    * value is shifted into positive range first — trunc ≡ floor there
    * — and shifted back: identical bands for negatives on any engine.
    */
  def bandFloor(colName: String, band: Long): Column = {
    val offset = band * 1000000L
    expr(s"((CAST($colName AS BIGINT) + ${offset}L) DIV $band)" +
      s" * $band - ${offset}L")
  }

  /** k-anonymity / l-diversity audit over a quasi-identifier set:
    * group rows by the QI columns, then report the equivalence-class
    * size distribution — classes, min/max k, rows in classes below
    * `kFloor` (the re-identifiable mass) — and min/avg l-diversity
    * (distinct sensitive values per class; a class with l = 1 leaks
    * its sensitive attribute outright even at large k). Two stacked
    * aggregates, both map-side combined; one summary row.
    */
  def kAnonymityAudit(
      df: DataFrame,
      quasiIdCols: Seq[String],
      sensitiveCol: String,
      kFloor: Int = 5): DataFrame = {
    require(quasiIdCols.nonEmpty && kFloor >= 2, "need QI cols, k >= 2")
    val classes = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__k"),
        countDistinct(col(sensitiveCol)).as("__l"))
    classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("__k")).cast("long").as("n_rows"),
      min(col("__k")).as("min_k"),
      max(col("__k")).as("max_k"),
      coalesce(sum(when(col("__k") < kFloor, col("__k"))), lit(0L))
        .cast("long").as("rows_below_k"),
      count(when(col("__k") < kFloor, lit(1))).as("classes_below_k"),
      min(col("__l")).as("min_l"),
      count(when(col("__l") === 1, lit(1))).as("classes_l1"))
      .select(col("n_classes"), col("n_rows"), col("min_k"),
        col("max_k"), col("rows_below_k"), col("classes_below_k"),
        (col("rows_below_k").cast("double") /
          col("n_rows").cast("double")).as("reident_rate"),
        col("min_l"), col("classes_l1"))
  }
}

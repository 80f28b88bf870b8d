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
    * numeric to its band's lower edge, as `v − posmod(v, band)` with
    * posmod = ((v % band + band) % band) ∈ [0, band). `%` follows the
    * dividend's sign in every SQL engine, so the double-mod is a TRUE
    * floor residue — identical bands for arbitrarily negative values
    * on trunc-DIV engines (Spark) and floor-`//` engines (DuckDB)
    * alike, with no magnitude assumption (the previous shift-by-
    * band·10⁶ trick silently diverged below −band·10⁶).
    */
  def bandFloor(colName: String, band: Long): Column =
    expr(s"CAST($colName AS BIGINT) - " +
      s"((CAST($colName AS BIGINT) % $band + $band) % $band)")

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

  /** Data-contract audit: evaluate a set of named boolean rules over
    * every row in ONE pass (a single conditional-count aggregate —
    * never one job per rule) and report violations per rule. The
    * pre-publish gate between a pipeline and its consumers; a NULL
    * rule result counts as a violation (unknown is not a pass).
    */
  def contractAudit(
      df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.flatMap { case ((_, rule), i) =>
      Seq(count(lit(1)).as(s"__n$i"),
        count(when(!coalesce(rule, lit(false)), lit(1)))
          .as(s"__v$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val cells = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', `__n$i`, `__v$i`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $cells) AS (rule, n_checked," +
        " n_violations)")
  }

  /** Generalization-ladder anonymity audit: [[kAnonymityAudit]] at a
    * sequence of band widths in one result — "how coarse must the
    * generalization get before the release is k-anonymous", the
    * utility-privacy dial read off a single table.
    */
  def anonymityLadder(
      df: DataFrame, stratumCol: String, numericCol: String,
      sensitiveCol: String, bands: Seq[Long],
      kFloor: Int = 5): DataFrame = {
    require(bands.nonEmpty, "need at least one band width")
    bands.map { b =>
      val banded = df.select(col(stratumCol),
        bandFloor(numericCol, b).as("__band"), col(sensitiveCol))
      kAnonymityAudit(banded, Seq(stratumCol, "__band"),
        sensitiveCol, kFloor)
        .withColumn("band", lit(b))
    }.reduce(_ unionByName _)
      .select(col("band"), col("n_classes"), col("n_rows"),
        col("min_k"), col("max_k"), col("rows_below_k"),
        col("classes_below_k"), col("reident_rate"), col("min_l"),
        col("classes_l1"))
  }

  /** Differential-privacy-style noisy count release: per-group counts
    * plus Laplace(1/ε) noise drawn DETERMINISTICALLY per group via the
    * salted-hash inverse-CDF (the q311 Poisson-bootstrap discipline —
    * no RNG, so the release is replayable and auditable; rotate the
    * salt per release to re-randomize):
    *   u = (h + ½)/2⁶⁰ ∈ (0,1),  h = 60-bit salted md5 of the group
    *   noise = −(1/ε)·sign(u−½)·ln(1 − 2|u−½|)
    *
    * NOTE: deterministic noise gives the Laplace SHAPE for utility
    * testing, not a formal DP guarantee (a true release needs fresh
    * randomness per query; with a secret salt this is the standard
    * PRF-noise construction). The true count column is emitted for
    * the test surface and would be DROPPED from a real release.
    *
    * Exactness: h→double is one correctly-rounded conversion on both
    * engines, /2⁶⁰ is exact, and the ln chain is written identically;
    * ln is libm (faithfully rounded) so the output ships ROUND(6)
    * (the q108 discipline).
    *
    * Scale shape: one map-side-combined aggregate; the noise is a
    * scan-stage expression on the |groups|-bounded result.
    */
  def laplaceNoisyCounts(
      df: DataFrame, groupCol: String, salt: String,
      epsilon: Double = 1.0): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val h = hashMask(col(groupCol), salt)
    val u = (h.cast("double") + lit(0.5)) / lit(math.pow(2.0, 60))
    val d = u - lit(0.5)
    val sgn = when(d < 0, lit(-1.0)).otherwise(lit(1.0))
    val noise = lit(-1.0 / epsilon) * sgn *
      log(lit(1.0) - lit(2.0) * abs(d))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_true"))
      .select(col(groupCol), col("n_true"),
        round(col("n_true").cast("double") + noise, 6)
          .as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `sample()`/`rand()` draws differ per run and per partitioning; a
  * training pipeline needs the SAME subset on every run, on any engine,
  * regardless of cluster layout. Keyed md5 sampling gives that: a row is
  * kept iff the top 60 bits of `md5(salt || id)` fall below
  * `fraction · 2⁶⁰` — a pure per-row predicate (no shuffle, fully
  * codegen'd, pushes through joins) that any SQL engine reproduces
  * bit-for-bit. Changing `salt` draws an independent sample (e.g.
  * train/validation splits via disjoint salts).
  */
object Sampling {

  /** 60-bit uniform hash of (salt, id) — first 15 hex chars of md5. */
  def hash60(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** Keep rows where hash60(salt, id)/2⁶⁰ < fraction. */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "s0:"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val threshold = (fraction * (1L << 60).toDouble).toLong
    df.filter(hash60(col(idCol), salt) < threshold)
  }
}

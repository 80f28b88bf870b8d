package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch operators for corpus-scale cardinality, membership
  * and frequency — the sketches a 100 TB pipeline runs INSTEAD of the
  * exact pass when the exact pass would shuffle the world. Each sketch
  * here is a deterministic function of its input (engine-portable md5
  * hashing, the NOTES.md 60-bit discipline), so every estimate is
  * exactly reproducible and exactly oracle-able — no RNG, no JVM
  * hashCode.
  *
  * Scale shapes:
  *  - HLL: one (group, register) shuffle with map-side max-combine —
  *    the register table is |groups|×m rows no matter how many input
  *    rows; registers then collapse to one row per group. The classic
  *    mergeable-union layout (Flajolet et al. 2007, §4).
  *  - Bloom: the filter is a (word → 64-bit OR) table of m/64 rows —
  *    broadcast-sized by construction; probing is a broadcast join, so
  *    the exact dedup shuffle only ever sees bloom-positive candidates.
  *  - CMS: d×w bounded counter grid via one (row, bucket) shuffle with
  *    map-side sum-combine (Cormode & Muthukrishnan 2005).
  */
object Sketches {

  /** Engine-portable 60-bit hash with a salt lane: md5 first 15 hex
    * chars (NOTES.md portable-hashing discipline; DuckDB replays as
    * ('0x'||substr(md5(...),1,15))::BIGINT). Nonnegative.
    */
  private def h60(c: Column, salt: Int): Column =
    conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 15), 16, 10)
      .cast("long")

  /** HyperLogLog (b register-index bits, m = 2^b registers). The
    * register maximum and the harmonic-sum accumulation are EXACT
    * integers: Σ 2^(-M_j) is kept as Σ 2^(maxRank - M_j) in int64
    * (empty registers contribute 2^maxRank each), so the estimate is
    * order-free and bit-reproducible; the only IEEE ops are the final
    * fixed multiply/divide chain. Small/large-range corrections (the
    * E < 2.5m linear count, the 2^32 collision regime) are the serving
    * layer's branch, not applied here: this operator reports the raw
    * estimator, and callers with tiny cardinalities should use the
    * exact count — at sketch-worthy scale the raw regime is the only
    * one left.
    */
  /** HLL register table per group: (groupCols*, reg, mj) — the
    * mergeable representation. Two register tables over disjoint (or
    * overlapping!) shards merge by `groupBy(group, reg).max(mj)`; see
    * [[hllMerge]]. |groups|×m rows regardless of input size.
    */
  def hllRegisters(
      df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16, s"register bits out of range: $b")
    val m = 1 << b
    val maxRank = 60 - b + 1 // w has 60-b bits; rank ∈ [1, maxRank]
    val g = groupCols.map(col)
    df.select(g :+ h60(col(keyCol), 0).as("__h"): _*)
      .withColumn("reg", col("__h") % m)
      .withColumn("__w", shiftright(col("__h"), b))
      // rank = leading zeros of the (60-b)-bit w, plus 1 =
      // maxRank - bitlength(w); bin() has no leading zeros in either
      // engine, so bitlength(w>0) = length(bin(w))
      .withColumn("__rank",
        when(col("__w") === 0, lit(maxRank))
          .otherwise(lit(maxRank) - length(bin(col("__w")))))
      .groupBy(g :+ col("reg"): _*)
      .agg(max(col("__rank")).as("mj"))
  }

  /** Union of register tables (same b): register-wise MAX — the HLL
    * merge that makes per-shard sketches combinable without re-reading
    * the shards.
    */
  def hllMerge(regTables: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(regTables.nonEmpty, "nothing to merge")
    regTables.reduce(_ unionByName _)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("mj")).as("mj"))
  }

  /** Finalize a register table into per-group estimates. */
  def hllFinalize(
      registers: DataFrame, groupCols: Seq[String], b: Int): DataFrame = {
    val m = 1 << b
    val maxRank = 60 - b + 1
    // Σ 2^(-M_j) scaled by 2^maxRank: observed registers contribute
    // 2^(maxRank-mj) ∈ [1, 2^(maxRank-1)], empty ones 2^maxRank each;
    // T ≤ m·2^maxRank = 2^61 at b=8 — exact in int64
    val scale = 1L << maxRank
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("registers_observed"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - mj)"))
          .as("__tobs"))
      .withColumn("t_scaled",
        col("__tobs") + (lit(m.toLong) - col("registers_observed")) *
          lit(scale))
      .withColumn("hll_estimate",
        alpha * lit(m.toDouble) * lit(m.toDouble) * lit(scale.toDouble) /
          col("t_scaled").cast("double"))
      .drop("__tobs")
  }

  /** One-pass HLL distinct-count estimate per group — registers +
    * finalize fused. Columns: groupCols*, registers_observed, t_scaled
    * (exact integer harmonic sum, scaled 2^(61-b)), hll_estimate.
    */
  def hllDistinct(
      df: DataFrame, keyCol: String, groupCols: Seq[String],
      b: Int = 8): DataFrame =
    hllFinalize(hllRegisters(df, keyCol, groupCols, b), groupCols, b)

  /** Bloom filter build: k salted bit positions per key over an
    * mBits-bit filter, packed as (word index → 64-bit OR) rows —
    * mBits/64 rows total, broadcast-sized by design. Deterministic:
    * the same corpus always builds the same filter.
    */
  def bloomBuild(
      df: DataFrame, keyCol: String, mBits: Int, k: Int = 3): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64: $mBits")
    require(k >= 1 && k <= 8, s"hash count out of range: $k")
    df.select(
        explode(array((0 until k).map(i =>
          h60(col(keyCol), i) % mBits): _*)).as("__pos"))
      .select(shiftright(col("__pos"), 6).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
          .as("__bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(__bit)").as("bits"))
  }

  /** Bloom probe: marks each row of `df` with `bloom_positive` — true
    * iff ALL k salted bits are set in the filter. The filter side is
    * broadcast (mBits/64 rows), so the probe is a scan-stage-cheap
    * broadcast join; only positives need the exact downstream check.
    * False positives are possible (that is the contract), negatives
    * are exact.
    */
  def bloomProbe(
      df: DataFrame, keyCol: String, bloom: DataFrame,
      mBits: Int, k: Int = 3): DataFrame = {
    // k separate broadcast lookups (k ≤ 8, filter side mBits/64 rows)
    // instead of explode + re-group: no row-identity bookkeeping, no
    // duplicate-row collapse, and every join stays a scan-stage
    // broadcast hash probe
    var out = df
    for (i <- 0 until k) {
      val b = bloom.select(col("word").as(s"__bw$i"),
        col("bits").as(s"__bb$i"))
      out = out
        .withColumn(s"__pos$i", h60(col(keyCol), i) % mBits)
        .join(broadcast(b),
          shiftright(col(s"__pos$i"), 6) === col(s"__bw$i"), "left")
        .withColumn(s"__hit$i",
          coalesce(col(s"__bb$i"), lit(0L)).bitwiseAND(
            expr(s"shiftleft(CAST(1 AS BIGINT), " +
              s"CAST(__pos$i % 64 AS INT))")) =!= 0L)
        .drop(s"__bw$i", s"__bb$i", s"__pos$i")
    }
    out
      .withColumn("bloom_positive",
        (0 until k).map(i => col(s"__hit$i")).reduce(_ && _))
      .drop((0 until k).map(i => s"__hit$i"): _*)
  }

  /** Count-Min frequency sketch: d salted rows × w buckets of exact
    * counts; the point estimate for a key is the MIN over its d row
    * counters — an overestimate, never an underestimate (Cormode &
    * Muthukrishnan 2005, §4.1). Build is one (row, bucket) shuffle
    * with map-side combine; the counter grid is d×w rows regardless
    * of input size.
    */
  def cmsBuild(
      df: DataFrame, keyCol: String, w: Int, d: Int = 3): DataFrame = {
    require(w >= 2 && d >= 1 && d <= 8, s"bad cms shape: w=$w d=$d")
    df.select(posexplode(array((0 until d).map(i =>
        h60(col(keyCol), i) % w): _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate keys against a CMS: joins each key's d (row,
    * bucket) coordinates against the counter grid (broadcast — the
    * grid is d×w rows) and takes the row-wise MIN. Returns
    * (keyCol, cms_estimate).
    */
  def cmsEstimate(
      keys: DataFrame, keyCol: String, cms: DataFrame,
      w: Int, d: Int = 3): DataFrame = {
    keys.select(col(keyCol))
      .distinct()
      .select(col(keyCol), posexplode(array((0 until d).map(i =>
        h60(col(keyCol), i) % w): _*)).as(Seq("__row", "__bucket")))
      .join(broadcast(cms),
        col("__row") === cms("row") && col("__bucket") === cms("bucket"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned join — the hand-rollable version of runtime row-level
  * filtering (Spark's `spark.sql.optimizer.runtimeFilter` family,
  * Trino's dynamic filtering): when a selective build side joins a huge
  * probe side, ship a Bloom filter of the build keys to the probe scan
  * and drop non-matching rows BEFORE the probe side's shuffle. False
  * positives only cost wasted shuffle bytes — the join itself removes
  * them — so the result is exactly the plain join, while the shuffle
  * volume drops to roughly the matching fraction (+ FP rate ≈
  * (1−e^(−kn/m))^k).
  *
  * The filter state is a fixed Array[Long] bitset built by one
  * bounded-state aggregate (map-side combinable ORs), broadcast as a
  * one-row frame; the probe-side membership test is pure codegen'd
  * Column math over the same double-hashing scheme (Kirsch-Mitzenmacher:
  * position_i = h1 + i·h2 mod m) seeded from one `xxhash64` — the
  * aggregator and the Column replay share the hash by construction.
  * All arithmetic stays below 2^34 (positions reduced mod m before the
  * multiply), so it is ANSI-overflow-safe on both paths.
  */
object BloomJoin {

  /** Number of 64-bit words for an m-bit filter. */
  private def wordsFor(numBits: Int): Int = {
    require(numBits >= 64 && numBits % 64 == 0,
      "numBits must be a positive multiple of 64")
    numBits / 64
  }

  private final class BloomAgg(words: Int, hashes: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Long, Array[Long], Array[Long]] {
    private val m = words * 64L
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], h: Long): Array[Long] = {
      val h1 = h >>> 32
      val h2m = java.lang.Math.floorMod(h | 1L, m)
      var i = 0
      while (i < hashes) {
        val pos = java.lang.Math.floorMod(h1 + i * h2m, m)
        b((pos >>> 6).toInt) |= (1L << (pos & 63L))
        i += 1
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** The probe-side membership predicate over a bloom array column —
    * the Column replay of [[BloomAgg.reduce]]'s bit positions. Pure
    * `functions._` math (no UDF): stays inside whole-stage codegen.
    */
  private def mightContain(
      bloomCol: Column, keyHash: Column, numBits: Int, hashes: Int)
      : Column = {
    val m = numBits.toLong
    val h1 = shiftrightunsigned(keyHash, 32)
    val h2m = pmod(keyHash.bitwiseOR(lit(1L)), lit(m))
    (0 until hashes).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2m, lit(m))
      val word = element_at(bloomCol,
        (shiftrightunsigned(pos, 6) + lit(1L)).cast("int"))
      // getbit takes the shift amount as a COLUMN (the Scala shiftleft/
      // shiftright helpers only accept literal amounts)
      call_function("getbit", word, pmod(pos, lit(64L)).cast("int")) ===
        lit(1)
    }.reduce(_ && _)
  }

  /** Inner-join `probe` to `build` on `key`, pruning probe rows through
    * a Bloom filter of the build keys before the probe shuffle. Output
    * ≡ `probe.join(build, key)` (property- and oracle-pinned); the
    * bloom stage is pure plan surface.
    *
    * @param numBits filter size in bits (multiple of 64). Size for
    *                ~10 bits/key for a ~1% FP rate at `hashes = 7`;
    *                the default fits ~100k build keys.
    * @param hashes  hash functions (Kirsch-Mitzenmacher double hashing)
    */
  def join(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      numBits: Int = 1 << 20,
      hashes: Int = 7): DataFrame = {
    val words = wordsFor(numBits)
    require(hashes >= 1 && hashes <= 16, "1..16 hash functions")
    val agg = udaf(new BloomAgg(words, hashes))
    val bloom = build
      .select(xxhash64(col(key)).as("__h"))
      .agg(agg(col("__h")).as("__bloom"))
    probe
      .crossJoin(broadcast(bloom))
      .filter(mightContain(
        col("__bloom"), xxhash64(col(key)), numBits, hashes))
      .drop("__bloom")
      .join(build, key)
  }
}

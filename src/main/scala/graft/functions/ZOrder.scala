package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data-layout
  * tool (Delta OPTIMIZE ZORDER, Iceberg sort orders): interleaving the
  * bits of two dimension columns into one sort key makes rows close in
  * EITHER dimension land close in the file order, so parquet row-group
  * min/max pruning works for filters on x, on y, and on both — a plain
  * (x, y) lexicographic sort prunes only on x.
  *
  * The key is pure codegen'd integer Column math (2·bits shift/and/or
  * terms — no UDF, no expression tree blowup at practical widths), and
  * because it is exact bit arithmetic an external engine replays it
  * term-for-term ([[sqlExpr]] emits the DuckDB form).
  *
  * At 100 TB this is a WRITE-SIDE operator: `zorderBy` feeds
  * `repartitionByRange` on the key (Spark samples the key distribution
  * to build balanced ranges) + an in-partition sort, which is exactly
  * the shuffle a sorted write needs anyway — clustering costs one
  * range exchange, and every later scan with a dimensional filter pays
  * less.
  */
object ZOrder {

  /** Morton-interleave the low `bits` of two non-negative integer
    * columns: x occupies even bit positions, y odd. Values must fit in
    * `bits` (callers bucket/clamp first — garbage-in high bits would
    * silently alias distant rows).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The identical interleave as engine-portable SQL (DuckDB `&`,`|`,
    * `<<`,`>>` bit operators) — the oracle-replay generator, one term
    * per bit per dimension like the Column form.
    */
  def sqlExpr(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    // CAST to BIGINT mirrors zValue's cast("long"): without it a 32-bit
    // column's term arithmetic stays 32-bit in the external engine and
    // a shift position >= 31 overflows (DuckDB errors; wrapping engines
    // corrupt the whole OR-combined key) while the Spark side succeeds
    (0 until bits).flatMap { i =>
      Seq(s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
  }

  /** Cluster `df` for 2-dimensional pruning: compute the z key, range-
    * partition on it (balanced via Spark's range sampling), sort within
    * partitions, drop the key. Writing the result yields files whose
    * per-column min/max spans are tight in BOTH dimensions.
    */
  def zorderBy(
      df: DataFrame, xCol: String, yCol: String,
      bits: Int, partitions: Int): DataFrame = {
    require(partitions >= 1, "partitions must be positive")
    require(!df.columns.contains("__z"),
      "input already has a __z column (reserved by zorderBy) — " +
        "withColumn would silently replace and then drop the caller's data")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

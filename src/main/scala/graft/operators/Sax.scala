package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX symbolization (Lin et al., "A Symbolic Representation of Time
  * Series"): each series z-normalizes, aggregates to `segments`
  * equal-count PAA means, and quantizes each mean through the Gaussian
  * breakpoints into a letter — giving a fixed-length word per series
  * that downstream motif mining / indexing can treat as a string.
  *
  * Scale shape: ONE shuffle keyed by the (high-cardinality) series id —
  * the ranking window, the segment aggregate and the word assembly all
  * key on it; nothing is ever globally ordered. All arithmetic before
  * the final divisions is exact: values quantize to integer µ-units
  * (floor(v·1e6) — identical on any engine), segment assignment is pure
  * integer division, and the PAA mean / series mean / series std are
  * IEEE expressions over exact integer sums — so the breakpoint
  * comparisons replay bit-for-bit in an external engine.
  *
  * Alphabet is the classic size-4 {a,b,c,d} with breakpoints
  * (−0.6745, 0, 0.6745) ≈ N(0,1) quartiles. A zero-variance series has
  * no z-score (try_divide NULLs it) and maps every segment to 'b' by
  * convention. Series shorter than `segments` simply produce a shorter
  * word (their trailing segments are empty).
  */
object Sax {

  /** @return (sensor_id, n, sax) — series length and its SAX word */
  def symbolize(
      samples: DataFrame, segments: Int = 4,
      unitsPerValue: Double = 1e6): DataFrame = {
    require(segments >= 1, "need at least one segment")
    val base = samples.select(col("sensor_id"),
      col("timestamp_us").as("t"),
      floor(col("value").cast("double") * unitsPerValue).cast("long")
        .as("__vq"))
    val w = Window.partitionBy(col("sensor_id")).orderBy(col("t"),
      col("__vq"))
    val wAll = Window.partitionBy(col("sensor_id"))
    val indexed = base
      .withColumn("__i", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__seg", expr(s"(__i * $segments) div __n"))
    val segs = indexed.groupBy(col("sensor_id"), col("__n"), col("__seg"))
      .agg(count(lit(1)).as("__c"),
        sum(col("__vq").cast("decimal(38,0)")).as("__segsum"),
        sum(col("__vq").cast("decimal(19,0)") * col("__vq"))
          .as("__segsq"))
    // series totals re-aggregate the segment sums — exact integers, so
    // Σ over segments ≡ Σ over the series; no second pass over the data
    // (analyzer note: column names must differ by more than case —
    // resolution is case-insensitive by default)
    val wSeries = Window.partitionBy(col("sensor_id"))
    val stats = segs
      .withColumn("__tsum", sum(col("__segsum")).over(wSeries)
        .cast("double"))
      .withColumn("__tsq", sum(col("__segsq")).over(wSeries)
        .cast("double"))
      .withColumn("__nd", col("__n").cast("double"))
    val mean = col("__tsum") / col("__nd")
    val std = sqrt(expr(
      "try_divide(__nd * __tsq - __tsum * __tsum, __nd * (__nd - 1.0))"))
    val z = expr("try_divide(__paa - __mean, __std)")
    val symbols = stats
      .withColumn("__paa", col("__segsum").cast("double") / col("__c"))
      .withColumn("__mean", mean)
      .withColumn("__std", std)
      .withColumn("__z", z)
      .withColumn("__sym",
        when(col("__z").isNull, lit("b"))
          .when(col("__z") < -0.6745, lit("a"))
          .when(col("__z") < 0.0, lit("b"))
          .when(col("__z") < 0.6745, lit("c"))
          .otherwise(lit("d")))
    symbols.groupBy(col("sensor_id"))
      .agg(max(col("__n")).as("n"),
        array_join(transform(
          array_sort(collect_list(struct(col("__seg"), col("__sym")))),
          x => x.getField("__sym")), "").as("sax"))
  }
}

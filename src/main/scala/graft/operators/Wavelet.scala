package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level Haar wavelet energy per series: how much signal variance
  * lives at the finest scale (adjacent-sample differences) vs one
  * octave up (pair-average differences) — the cheap spectral
  * fingerprint that separates jitter from drift before any modelling.
  *
  * Exactness: values quantize to integer µ-units, so every Haar
  * numerator (x₂ᵢ − x₂ᵢ₊₁ at level 1, pair-sum differences at level 2)
  * is an exact integer and the energy sums accumulate in DECIMAL; the
  * dyadic denominators (4, 16) and the µ² rescale divide ONCE at the
  * end — fixed IEEE shapes an external engine replays bit-for-bit.
  *
  * Scale shape: one series-keyed rank window, then two grouped
  * aggregates (pair index = i div 2 — a key extension of the series
  * key, so Catalyst keeps the partitioning); odd tails drop at each
  * level, exactly like the textbook transform on non-dyadic lengths.
  *
  * Output: (sensor_id, n, n_pairs1, n_pairs2, e1, e2) — energies in
  * original units², level 2 NULL when the series has < 4 samples.
  */
object Wavelet {

  def haarEnergies(
      samples: DataFrame, unitsPerValue: Double = 1e6): DataFrame = {
    val base = samples.select(col("sensor_id"),
      col("timestamp_us").as("t"),
      floor(col("value").cast("double") * unitsPerValue).cast("long")
        .as("__vq"))
    val wOrd = Window.partitionBy(col("sensor_id"))
      .orderBy(col("t"), col("__vq"))
    val idx = base.withColumn("__i", row_number().over(wOrd) - 1)
    val l1 = idx.groupBy(col("sensor_id"),
        expr("__i div 2").as("__j"))
      .agg(max(when(expr("__i % 2 = 0"), col("__vq"))).as("__xe"),
        max(when(expr("__i % 2 = 1"), col("__vq"))).as("__xo"),
        count(lit(1)).as("__c"))
    val p1 = l1.filter(col("__c") === 2)
      .select(col("sensor_id"), col("__j"),
        (col("__xe") - col("__xo")).as("__d"),
        (col("__xe") + col("__xo")).as("__s"))
    val l2 = p1.groupBy(col("sensor_id"),
        expr("__j div 2").as("__k"))
      .agg(max(when(expr("__j % 2 = 0"), col("__s"))).as("__se"),
        max(when(expr("__j % 2 = 1"), col("__s"))).as("__so"),
        count(lit(1)).as("__c"))
    val p2 = l2.filter(col("__c") === 2)
      .select(col("sensor_id"), (col("__se") - col("__so")).as("__d2"))
    val uu = unitsPerValue * unitsPerValue
    val e1 = p1.groupBy(col("sensor_id"))
      .agg(count(lit(1)).as("n_pairs1"),
        sum(col("__d").cast("decimal(19,0)") * col("__d"))
          .cast("double").as("__sd1"))
    val e2 = p2.groupBy(col("sensor_id"))
      .agg(count(lit(1)).as("n_pairs2"),
        sum(col("__d2").cast("decimal(19,0)") * col("__d2"))
          .cast("double").as("__sd2"))
    val n = base.groupBy(col("sensor_id")).agg(count(lit(1)).as("n"))
    // no ROUND: sd/4/µ² is a fixed IEEE chain on exact integers
    // (bit-replayable), and its exact rational value terminates with a
    // possible 5 at the 7th decimal — a true round-half tie where
    // engines' rounding algorithms legitimately disagree
    n.join(e1, Seq("sensor_id"), "left")
      .join(e2, Seq("sensor_id"), "left")
      .select(col("sensor_id"), col("n"),
        coalesce(col("n_pairs1"), lit(0L)).as("n_pairs1"),
        coalesce(col("n_pairs2"), lit(0L)).as("n_pairs2"),
        (col("__sd1") / 4.0 / uu).as("e1"),
        (col("__sd2") / 16.0 / uu).as("e2"))
  }
}

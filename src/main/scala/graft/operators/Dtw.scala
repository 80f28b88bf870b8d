package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic-time-warping distance from each sensor's daily profile to
  * the fleet profile — the alignment-tolerant shape comparison
  * (Berndt & Clifford 1994): a sensor whose load curve is the fleet's
  * shifted two hours still scores close, where Euclidean distance
  * would not. The fleet screen for "whose daily SHAPE deviates".
  *
  * Profiles are 24 hour-of-day buckets, each the FLOOR-division mean
  * of milli-unit values (Σq div n — exact integers; missing hours
  * fill 0), so the DP runs entirely in int64: |aᵢ−bⱼ| costs, min
  * chains, no floats anywhere — the result is exact on ANY engine
  * regardless of evaluation order, the strongest replay class (no
  * quantization discipline needed at all). Band sums stay far below
  * the 2⁶² sentinel that pads the DP borders.
  *
  * Scale shape: one (sensor, hour) aggregate → 24-element dense
  * arrays via a scan-stage transform (the resample-grid pattern);
  * the fleet profile is a 24-row aggregate collected under the
  * IVF-centroid bounded-serving contract; the O(24²) DP folds per
  * sensor inside a typed map — embarrassingly parallel over sensors.
  */
object Dtw {

  private val Inf = 4611686018427387904L // 2^62: survives + cost

  /** @return (sensor_id, n_hours_present, dtw_cost) */
  def dtwToFleet(
      samples: DataFrame, buckets: Int = 24,
      bucketUs: Long = 3600000000L,
      unitsPerValue: Double = 1e3): DataFrame = {
    require(buckets >= 2 && bucketUs > 0, "need >=2 positive buckets")
    val spark = samples.sparkSession
    import spark.implicits._
    val base = samples.select(
      col("sensor_id").cast("string"),
      (expr(s"CAST(timestamp_us AS BIGINT) div ${bucketUs}L")
        % buckets).as("h"),
      floor(col("value") * unitsPerValue).cast("long").as("q"))
    val hs = base.groupBy(col("sensor_id"), col("h"))
      .agg(sum(col("q")).as("__s"), count(lit(1)).as("__c"))
      .select(col("sensor_id"), col("h"),
        expr("__s div __c").as("v"))
    val prof = hs.groupBy(col("sensor_id"))
      .agg(count(lit(1)).as("nh"),
        map_from_entries(collect_list(struct(col("h"), col("v"))))
          .as("__m"))
      .select(col("sensor_id"), col("nh"),
        expr(s"transform(sequence(0, ${buckets - 1}), x ->" +
          " coalesce(element_at(__m, CAST(x AS BIGINT))," +
          " CAST(0 AS BIGINT)))").as("arr"))
    // fleet profile: `buckets` rows — the bounded serving edge
    val fleetRows = base.groupBy(col("h"))
      .agg(sum(col("q")).as("__s"), count(lit(1)).as("__c"))
      .select(col("h"), expr("__s div __c").as("v"))
      .collect()
    val b = Array.fill(buckets)(0L)
    fleetRows.foreach(r => b(r.getAs[Long]("h").toInt) =
      r.getAs[Long]("v"))
    val bB = spark.sparkContext.broadcast(b)
    prof.as[(String, Long, Seq[Long])]
      .map { case (sid, nh, arr) =>
        (sid, nh, dtw(arr.toArray, bB.value))
      }
      .toDF("sensor_id", "n_hours_present", "dtw_cost")
  }

  /** Plain O(nm) DTW over int64 series with a two-row rolling DP. */
  private[graft] def dtw(a: Array[Long], b: Array[Long]): Long = {
    var prev = Array.fill(b.length + 1)(Inf)
    prev(0) = 0L
    var cur = new Array[Long](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = Inf
      var j = 1
      while (j <= b.length) {
        val cost = math.abs(a(i - 1) - b(j - 1))
        val m = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = cost + m
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length)
  }
}

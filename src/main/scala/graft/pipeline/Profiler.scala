package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline health checks: per-column statistics
  * computed in ONE pass over the data (a single aggregate collects
  * every column's stats simultaneously — never one job per column),
  * then unpivoted to a stable (column, stats...) row surface for
  * drift comparison between corpus snapshots.
  */
object Profiler {

  /** Numeric profile: row count, non-null count, min, max, mean and
    * sample standard deviation per column. One map-side-combined
    * aggregate regardless of column count; the unpivot is a zero-cost
    * projection of the single result row.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}__n"),
        min(col(c)).cast("double").as(s"__${c}__min"),
        max(col(c)).cast("double").as(s"__${c}__max"),
        avg(col(c)).as(s"__${c}__mean"),
        stddev_samp(col(c)).as(s"__${c}__std"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // stack() takes a FLAT argument list (values group by arity)
    val stacked = cols.map { c =>
      s"'$c', `__${c}__n`, `__rows` - `__${c}__n`, `__${c}__min`, " +
        s"`__${c}__max`, `__${c}__mean`, `__${c}__std`"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${cols.length}, $stacked) AS " +
        "(column, n, n_nulls, min, max, mean, stddev)")
  }

  /** Quantile profile: the requested percentiles per numeric column,
    * one aggregate pass for ALL columns (one percentile buffer per
    * column — twelve scalar percentile aggregates measured 6x slower
    * for identical output), unpivoted to (column, p25, p50, ...).
    *
    * `exact = false` (the default, and the PRODUCTION path) uses
    * `approx_percentile`: a Greenwald-Khanna summary whose state is
    * bounded by `accuracy`, not by row count, so the ungrouped
    * aggregate survives a 100 TB corpus — exact `percentile` buffers
    * every value of every profiled column into the final reduce and
    * OOMs there. `exact = true` is the fixture-scale oracle surface
    * (DuckDB `quantile_cont` hash-matches Spark's exact percentile;
    * no engine can replay a t-digest byte-for-byte); an ε-bound
    * property in PipelineSpec ties the two paths together.
    */
  def quantileProfile(
      df: DataFrame, cols: Seq[String],
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probabilities must be in [0, 1]")
    require(accuracy >= 1, "accuracy must be positive")
    val parr = array(probs.map(lit): _*)
    val aggs = cols.map { c =>
      val v = col(c).cast("double")
      (if (exact) percentile(v, parr)
       else percentile_approx(v, parr, lit(accuracy))).as(s"__$c")
    }
    val names = probs.map(p =>
      "p" + BigDecimal(p * 100).bigDecimal.stripTrailingZeros
        .toPlainString.replace(".", "_").replace("-", "m"))
    val stacked = cols.map { c =>
      (s"'$c'" +: probs.indices.map(i => s"`__$c`[$i]")).mkString(", ")
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.length}, $stacked) AS " +
        s"(column, ${names.mkString(", ")})")
  }

  /** Categorical profile: distinct-value count and the top-k most
    * frequent values per string column. All columns MELT into one
    * (column, value) frame first — so the whole profile is ONE shuffle
    * keyed by (column, value) plus a rank window over the (tiny)
    * per-column value counts, instead of one job per column. Ties
    * break on the value string, so the top-k set is deterministic.
    * Output: (column, n_distinct, rank, value, n).
    */
  def categoricalProfile(
      df: DataFrame, cols: Seq[String], k: Int = 3,
      approxDistinct: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(k >= 1, "k must be at least 1")
    val melted = df.select(posexplode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
      .as(Seq("__i", "__cv")))
      .select(col("__cv.column").as("column"), col("__cv.value").as("value"))
    val counts = melted.groupBy(col("column"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("column"))
      .orderBy(col("n").desc, col("value"))
    val ranked = counts.withColumn("rank", row_number().over(w))
    if (!approxDistinct)
      // exact distinct count: a window count over the per-column value
      // counts — the ORACLE surface, but the count window gathers every
      // distinct value of a column into one partition, so it is the
      // fixture-scale path only
      ranked
        .withColumn("n_distinct",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("column"))))
        .filter(col("rank") <= k)
        .select(col("column"), col("n_distinct"), col("rank"),
          col("value"), col("n"))
    else {
      // PRODUCTION path for high-cardinality columns: HLL sketch with
      // rsd-bounded state instead of the exact window count. It runs
      // over `counts` (already one row per distinct pair, map-side
      // combinable), and the column-count-sized result broadcasts back
      // onto the top-k rows.
      val nd = counts.groupBy(col("column"))
        .agg(approx_count_distinct(col("value"), rsd).as("n_distinct"))
      ranked.filter(col("rank") <= k)
        .join(broadcast(nd), "column")
        .select(col("column"), col("n_distinct"), col("rank"),
          col("value"), col("n"))
    }
  }

  /** Drift report between two profile snapshots (the corpus-health
    * check between pipeline runs): per column, both means, the mean
    * shift normalized by the BASELINE stddev (a z-score-flavored
    * magnitude that is scale-free per column), and the row-count
    * ratio. Joins two [[numericProfile]] outputs on the column name —
    * profiles are column-count-sized, so the join is trivially
    * broadcast; the heavy lifting stays in the two one-pass profiles.
    */
  def drift(baseline: DataFrame, current: DataFrame): DataFrame = {
    val b = baseline.select(col("column"),
      col("n").as("n_base"), col("mean").as("mean_base"),
      col("stddev").as("stddev_base"))
    val c = current.select(col("column"),
      col("n").as("n_cur"), col("mean").as("mean_cur"))
    b.join(c, "column")
      .select(col("column"), col("n_base"), col("n_cur"),
        col("mean_base"), col("mean_cur"),
        (abs(col("mean_cur") - col("mean_base")) / col("stddev_base"))
          .as("mean_shift"),
        (col("n_cur").cast("double") / col("n_base")).as("count_ratio"))
  }
}

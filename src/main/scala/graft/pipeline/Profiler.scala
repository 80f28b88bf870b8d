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
}

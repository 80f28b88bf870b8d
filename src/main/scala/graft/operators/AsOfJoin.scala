package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key group.
  *
  * The reference documents (but never implemented) this for virtual
  * composite sensors (reference: docs/DATAMODEL.md:125-131). Implemented
  * the shuffle-minimal way: union both sides tagged, one window sort per
  * key, `last(_, ignoreNulls)` carries the latest right value forward.
  * One shuffle on the key — no N² join, no range-condition nested loop;
  * survives skew via AQE because it is a plain window over the key.
  */
object AsOfJoin {

  /** @param left  DataFrame with `key`, `ts` and payload columns
    * @param right DataFrame with `key`, `ts` and `valueCols` to carry
    * @return left rows + `right_ts` + carried value columns (inner: left
    *         rows with no prior right row are dropped)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__right_ts", lit(null).cast("long"))
    var r = right.select(
      (Seq(col(key), col(ts).as(ts)) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
      .withColumn("__right_ts", col(ts))
    // align schemas: right lacks left's payload columns
    val leftOnly = l.columns.toSet -- r.columns.toSet
    leftOnly.foreach { c =>
      r = r.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }
    val rightVals = valueCols.map(c => s"__r_$c")
    val lAligned = valueCols.foldLeft(l) { (df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(r.schema(c).dataType))
    }.drop(valueCols: _*)
    val rAligned = valueCols.foldLeft(r) { (df, c) =>
      df.withColumn(s"__r_$c", col(c))
    }.drop(valueCols: _*)

    val unioned = lAligned.unionByName(rAligned)
    // right rows sort before left rows at equal ts => exact-tie matches
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightVals :+ "__right_ts").foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val renamed = valueCols.foldLeft(carried) { (df, c) =>
      df.withColumnRenamed(s"__r_$c", c)
    }
    renamed
      .filter(col("__side") === 1 && col("__right_ts").isNotNull)
      .withColumnRenamed("__right_ts", "right_ts")
      .drop("__side")
  }

  /** Nearest-match as-of join (pandas merge_asof direction='nearest'):
    * for each left row, the right row in the same key group with the
    * SMALLEST |right.ts − left.ts|, ties to the earlier (backward)
    * side; rows with no right neighbor within `toleranceUs` drop
    * (inner). Same one-shuffle union+window shape as [[asOf]], with a
    * backward carry and a forward carry over one key partitioning —
    * the chooser is a pure integer-µs compare, engine-replayable.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCol: String,
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, "tolerance must be >= 0")
    require(!left.columns.contains(valueCol),
      s"left side already has a $valueCol column")
    val r = right.select(col(key), col(ts), col(valueCol))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
      .withColumn(valueCol, lit(null).cast(r.schema(valueCol).dataType))
    val leftOnly = l.columns.toSet -- r.columns.toSet
    val rAligned = leftOnly.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(l.schema(c).dataType)))
    val unioned = l.unionByName(rAligned)
    val back = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightTs = when(col("__side") === 0, col(ts))
    val rightVal = when(col("__side") === 0, col(valueCol))
    val carried = unioned
      .withColumn("__pts", last(rightTs, ignoreNulls = true).over(back))
      .withColumn("__pv", last(rightVal, ignoreNulls = true).over(back))
      .withColumn("__nts", first(rightTs, ignoreNulls = true).over(fwd))
      .withColumn("__nv", first(rightVal, ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
    val dPrev = col(ts) - col("__pts") // >= 0 when present
    val dNext = col("__nts") - col(ts)
    val usePrev = col("__pts").isNotNull &&
      (col("__nts").isNull || dPrev <= dNext) // tie -> backward
    carried
      .withColumn("right_ts", when(usePrev, col("__pts"))
        .otherwise(col("__nts")))
      .withColumn("__rv", when(usePrev, col("__pv"))
        .otherwise(col("__nv")))
      .filter(col("right_ts").isNotNull &&
        abs(col(ts) - col("right_ts")) <= toleranceUs)
      .drop("__side", "__pts", "__pv", "__nts", "__nv")
      .withColumn(valueCol, col("__rv"))
      .drop("__rv")
  }

  /** Native as-of join through the custom physical operator
    * ([[graft.plans.AsOfJoinPlan]] → [[graft.plans.AsOfJoinExec]]):
    * same contract and output surface as [[asOf]] — left rows +
    * `right_ts` + carried value columns, inner semantics — but
    * executed as ONE streaming merge per co-partitioned, co-sorted
    * partition pair instead of the union+window carry. PropertySpec
    * pins the two equivalent; requires the session to carry
    * [[graft.GraftExtensions]] (GraftSession does) and a LongType
    * `ts` on both sides. Key columns must share one data type (the
    * physical operator rejects a mismatch at plan time — cast before
    * joining); NULL keys match nothing and are skipped on both sides,
    * the same SQL-join semantics the composed [[asOf]] twin produces.
    */
  def asOfNative(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    val lp = left.queryExecution.analyzed
    // re-alias the right child's columns: fresh exprIds, so an as-of
    // self-join of one base relation cannot alias across sides
    val rp0 = right.queryExecution.analyzed
    val rp = Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def find(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val lKey = find(lp, key)
    val lTs = find(lp, ts)
    val rKey = find(rp, key)
    val rTs = find(rp, ts)
    val rVals = valueCols.map(find(rp, _))
    val tsOut = AttributeReference("right_ts", rTs.dataType, nullable = true)()
    val valsOut = rVals.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)())
    val node = graft.plans.AsOfJoinPlan(
      lp, rp, lKey, lTs, rKey, rTs, rVals, tsOut, valsOut)
    org.apache.spark.sql.GraftSqlShim.ofRows(spark, node)
  }
}

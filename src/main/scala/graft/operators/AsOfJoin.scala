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
}

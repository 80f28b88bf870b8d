package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface — the standard extension-library
  * trick (a single object placed in Spark's package): lets graft build
  * a DataFrame from a custom LogicalPlan (the as-of join node) without
  * reflection. Nothing else lives in this namespace.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a Catalyst Expression as a Column without a session-scoped
    * function registration (the linear-regex predicates are built by
    * library code that can't assume GraftExtensions was installed).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}

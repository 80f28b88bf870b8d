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
}

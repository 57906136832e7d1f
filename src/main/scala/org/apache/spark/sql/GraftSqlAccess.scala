package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal access shim: `Dataset.ofRows` is `private[sql]`, and building a
  * DataFrame from a custom [[LogicalPlan]] node (graft.plans.AsOfJoinPlan)
  * needs it. Placing one forwarding object inside the `org.apache.spark
  * .sql` package is the standard pattern public Spark extension libraries
  * use for exactly this; nothing else from the private surface is touched.
  */
object GraftSqlAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Spark 4's Column wraps a ColumnNode, not an Expression; the converter
    * lives behind the same `private[sql]` wall.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}

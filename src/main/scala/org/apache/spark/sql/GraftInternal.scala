package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into private[sql] surface: constructing a DataFrame from a custom
  * LogicalPlan (graft.plans.AsOfJoinPlan). The standard extension-library
  * shim — no behavior, just visibility. */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression bridges for graft's native expressions that are
    * used WITHOUT a session-registry registration (Det.hash32 is called
    * from plan-builder code where no SparkSession is in scope). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}

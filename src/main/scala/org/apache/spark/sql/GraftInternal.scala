package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into private[sql] surface: constructing a DataFrame from a custom
  * LogicalPlan (graft.plans.AsOfJoinPlan). The standard extension-library
  * shim — no behavior, just visibility. */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

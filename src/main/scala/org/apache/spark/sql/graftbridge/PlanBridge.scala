package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into Spark's `private[sql]` Dataset construction, so custom
  * logical operators (graft.plans) can surface as ordinary DataFrames.
  * Same pattern as [[ColumnBridge]]: a tiny shim inside the
  * org.apache.spark.sql package tree — the standard extension-library
  * mechanism for libraries that add their own LogicalPlan nodes.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

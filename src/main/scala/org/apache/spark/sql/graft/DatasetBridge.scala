package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark 4's classic Dataset factory (`private[sql]`) — the
  * conventional extension-library technique for materializing a DataFrame
  * from a custom `LogicalPlan` node (the §2.9 level-(c) operator path).
  */
object DatasetBridge {

  /** DataFrame over an arbitrary logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed plan of a DataFrame (resolved attributes, ready to embed
    * as a child of a custom node). */
  def plan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}

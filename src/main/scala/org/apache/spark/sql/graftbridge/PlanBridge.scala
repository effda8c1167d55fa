package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkPlan

/** Companion seam to [[ColumnBridge]] for whole-plan surgery. Spark 4.x keeps
  * `Dataset.ofRows` and `queryExecution` on the `classic` implementation
  * behind `private[sql]`; graft's custom logical operators (e.g. the as-of
  * join in `graft.plans`) need exactly two hops: analyzed-plan extraction from
  * a user DataFrame and DataFrame construction around a custom LogicalPlan.
  * Nothing else may go in this file.
  */
object PlanBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  def optimizedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.optimizedPlan

  def executedPlan(df: DataFrame): SparkPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan

  /** Session-local SQL function registration for sessions built without
    * `withExtensions` — same (identifier, info, builder) triple the
    * extensions path injects.
    */
  def registerFunction(
      s: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    s.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)
}

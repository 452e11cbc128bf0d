package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ⇄ Expression converters, so graft's
  * native Catalyst expressions can be exposed as user-facing Columns
  * (the same pattern third-party Spark extensions use). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an already-analyzed logical plan as a DataFrame (the bridge to the
    * private[sql] `classic.Dataset.ofRows`) — used by optimizer rules that
    * re-plan a matched subtree with DataFrame-level machinery. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  * Spark 4 made these conversions `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so third-party
  * expression libraries expose them through an in-package shim — the
  * standard pattern for Spark extension libraries.
  */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Remove `observe` (CollectMetrics) nodes from a frame's plan. For
    * side-car actions (e.g. FileWriter's record-size sampling) that would
    * otherwise re-fire the topology's observations and double-count the
    * run's stats totals.
    */
  def stripObservations(df: DataFrame): DataFrame = {
    val cleaned = df.queryExecution.logical.transform {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.child
    }
    classic.Dataset.ofRows(df.sparkSession.asInstanceOf[classic.SparkSession], cleaned)
  }
}

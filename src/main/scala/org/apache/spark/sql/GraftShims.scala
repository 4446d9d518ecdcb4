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
}

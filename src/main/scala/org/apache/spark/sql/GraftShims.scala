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
  /** A serializable handle on a Hadoop Configuration (which itself is not
    * java-serializable) for shipping to executors inside DSv2 reader
    * factories. Spark's own wrapper is `private[spark]`; the returned
    * closure captures it, so callers outside the spark namespace can hold
    * a plain serializable `() => Configuration`.
    */
  def serializableHadoopConf(
      conf: org.apache.hadoop.conf.Configuration): () => org.apache.hadoop.conf.Configuration = {
    val sc = new org.apache.spark.util.SerializableConfiguration(conf)
    () => sc.value
  }

  def stripObservations(df: DataFrame): DataFrame = {
    val cleaned = df.queryExecution.logical.transform {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.child
    }
    classic.Dataset.ofRows(df.sparkSession.asInstanceOf[classic.SparkSession], cleaned)
  }
}

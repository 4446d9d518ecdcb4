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

  /** EAGER Column → Expression conversion. `toExpression` wraps the
    * Column's node lazily (`ColumnNodeExpression`) and relies on the
    * Dataset API boundary to convert it; a SQL FunctionRegistry builder
    * has no such boundary — it must hand the analyzer a real expression
    * tree (possibly containing `UnresolvedFunction`s, which the analyzer
    * then resolves), or codegen later meets an untranslated node.
    */
  def toEagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

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

  /** Register a Catalyst function builder on an ALREADY-BUILT session's
    * function registry (the extensions mechanism only runs at session
    * construction, but Verify/Bench adopt the driver's session).
    * `sessionState` is `private[sql]` in Spark 4, hence the shim.
    */
  def registerFunction(spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** Apply a SparkSessionExtensions' injected functions to a fresh copy of
    * the builtin registry and list every registered name — lets tests
    * verify the `spark.sql.extensions` path without building a session.
    */
  def injectedFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone()
    val before = reg.listFunction().map(_.funcName).toSet
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName).filterNot(before)
  }

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

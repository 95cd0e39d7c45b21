package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API (Spark 4 moved Column onto ColumnNode; the classic
  * converters are private[sql], hence this shim package placement).
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until all queued listener-bus events are delivered (listener
    * callbacks are async; deterministic metric reads need a flush —
    * `listenerBus` is private[spark], hence shim placement).
    */
  def waitForListenerBus(spark: SparkSession, timeoutMs: Long = 30000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}

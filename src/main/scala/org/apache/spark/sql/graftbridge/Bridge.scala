package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils`
  * `private[sql]`, so extension libraries reach it from an
  * `org.apache.spark.sql` subpackage — the standard pattern for
  * registering custom Catalyst expressions from outside Spark.
  */
/** A broadcast of the driver's Hadoop configuration, usable from
  * executor-side closures. `SerializableConfiguration` itself is
  * `private[spark]`, so this public wrapper carries it across the
  * package boundary.
  */
final class HadoopConfBroadcast private[graftbridge] (
    bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration])
  extends Serializable {
  def value: org.apache.hadoop.conf.Configuration = bc.value.value
}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Broadcast the session's Hadoop conf (spark.hadoop.* and SQL-scoped
    * settings included — what a bare `new Configuration()` on an
    * executor silently drops).
    */
  def broadcastHadoopConf(spark: org.apache.spark.sql.SparkSession): HadoopConfBroadcast =
    new HadoopConfBroadcast(org.apache.spark.util.SerializableConfiguration
      .broadcast(spark.sparkContext, spark.sessionState.newHadoopConf()))

  /** Build a DataFrame from a raw Catalyst logical plan (for custom
    * LogicalPlan nodes — `Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Drain the async listener bus (`private[spark]`): per-query metric
    * attribution in Bench must not read listener-fed counters while
    * stage/task-completion events are still in flight.
    */
  def drainListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Register a temp SQL function on a live session (the function
    * registry is likewise `private[sql]`).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
}

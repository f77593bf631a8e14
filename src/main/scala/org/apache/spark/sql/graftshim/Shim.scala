package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column <-> Expression
  * converters so graft can plan custom Catalyst expressions from the
  * public DataFrame API (the Spark-extension-library idiom: live in an
  * `org.apache.spark.sql` subpackage). Nothing here is proprietary —
  * it calls the stock Spark 4.1.2 classic converters.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (classic Dataset.ofRows),
    * and the plan behind a DataFrame — the two hooks a bespoke
    * operator needs to round-trip through the public API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Force-create the driver's StateStoreCoordinator RPC endpoint.
    * Streaming queries create it lazily on first run; BATCH execution
    * of a stateful operator (`transformWithState` in batch mode) needs
    * it already up, or every task dies with
    * RpcEndpointNotFoundException. Idempotent — the lazy val caches.
    */
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.streams.asInstanceOf[org.apache.spark.sql.classic.StreamingQueryManager]
      .stateStoreCoordinator: Unit
}

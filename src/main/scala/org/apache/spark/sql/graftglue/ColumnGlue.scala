package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made the converters
  * `private[sql]` (`classic.ExpressionUtils`); extensions that add
  * native Catalyst expressions need this two-line glue inside the sql
  * package namespace — the documented pattern for third-party
  * expression libraries.
  */
object ColumnGlue {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Drain the async listener bus — `SparkContext.listenerBus` is
    * private[spark]; metric harvesting (graft.Observability) needs a
    * deterministic flush before reading captured stats.
    */
  def flushListenerBus(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** DataFrame from a LogicalPlan — `Dataset.ofRows` is private[sql];
    * custom logical operators (graft.plans) need this bridge to hand
    * their plan back to the public API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 routes Column through
  * ColumnNode and keeps the converter `private[sql]`; extension
  * libraries conventionally bridge from inside the sql package
  * namespace (cf. the public Qbeast/spark-extension pattern). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) logical plan — classic backend. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unload every registered state-store provider (`private[sql]` on
    * the StateStore object). Safe whenever the loaded stores' queries
    * are finished and their checkpoints discarded — exactly the drain
    * pattern: a fresh temp checkpoint per drain means no later query
    * can ever reuse the providers, yet the registry would hold their
    * in-memory state maps until the next maintenance tick. */
  def unloadAllStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}

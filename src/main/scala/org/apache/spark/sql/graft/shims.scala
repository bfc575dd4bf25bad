package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal.SessionState

/** Bridge into `private[sql]` Spark 4 internals, the standard pattern for
  * third-party Catalyst extension libraries: Spark 4 routes `Column` through
  * `ColumnNode` (for Connect) and hides the classic Expression constructors
  * behind `private[sql] classic.ExpressionUtils`. This shim re-exports just
  * the two conversions graft's custom expressions need, plus sessionState
  * for function registration.
  */
object shims {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column (classic mode). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session state of a classic SparkSession (for FunctionRegistry). */
  def sessionState(spark: SparkSession): SessionState =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState
}

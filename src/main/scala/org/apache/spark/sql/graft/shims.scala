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

  /** Wrap a one-row/one-column Dataset as a scalar-subquery Column.
    *
    * The point vs `crossJoin(broadcast(oneRowDf))`: a joined-in value
    * is read from its UnsafeRow on EVERY evaluation, and
    * `UnsafeRow.getBinary` COPIES the bytes — for a large BINARY value
    * (a serialized Bloom filter, a codebook) probed per corpus row,
    * that is gigabytes of memcpy charged to the probe loop (measured:
    * 95% of d9's executor CPU). A scalar subquery executes ONCE and is
    * inlined as a runtime literal, so codegen references the SAME
    * byte array for every row.
    */
  def scalarSubquery(df: org.apache.spark.sql.Dataset[_]): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.queryExecution.analyzed))

  /** Release the storage behind a checkpointed Dataset — blocks for a
    * localCheckpoint, FILES for a reliable checkpoint. Checkpoint state
    * lives on the backing RDD, not in the CacheManager, so
    * `Dataset.unpersist` can't free it, and the ContextCleaner only gets
    * to it after a GC notices the RDD is unreachable (files additionally
    * require `spark.cleaner.referenceTracking.cleanCheckpoints=true`,
    * default FALSE) — both too lazy for an iterative algorithm that
    * retires a round per loop step. ONLY call this for state with no
    * other readers: a checkpoint has no lineage to recompute from, so
    * releasing under an in-flight consumer is fatal. No-op for plans
    * that aren't a checkpoint leaf.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        try {
          l.rdd.unpersist(blocking = false)
          l.rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            fs.delete(p, true); ()
          }
        } catch { case _: Exception => () }
      case _ => ()
    }
}

package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core internals (the sql-side sibling is
  * [[org.apache.spark.sql.graft.shims]]).
  */
object sparkShims {
  /** Block until the listener bus has delivered every queued event, up
    * to `timeoutMillis`. Needed to attribute async listener counts
    * (e.g. per-query job counts in the bench) deterministically — a
    * sleep-until-stable poll misattributes trailing events whenever
    * dispatch pauses longer than the poll interval, i.e. exactly on
    * loaded machines. A drain that exceeds the (generous) timeout
    * degrades to possible misattribution rather than aborting the
    * caller: the no-arg `waitUntilEmpty()` would THROW after a
    * hard-coded 10 s.
    */
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Recursively delete `dir` at JVM exit via Spark's own shutdown-hook
    * registry (the same mechanism its temp dirs use, ordered before the
    * FileSystem shutdown). For scratch data a LAZY plan still needs to
    * read later in the process — eager deletion would break the read,
    * and leaving it leaks a copy per run.
    */
  def deleteDirOnExit(dir: java.io.File): Unit =
    org.apache.spark.util.ShutdownHookManager.registerShutdownDeleteDir(dir)

  /** A task-shippable supplier of the driver's Hadoop configuration,
    * for sinks whose executors open `FileSystem` streams directly
    * (e.g. the WARC writer). Spark's own wrapper
    * (`org.apache.spark.util.SerializableConfiguration`) is
    * `private[spark]`, so the public surface is a serializable closure
    * over it — a plain `new Configuration()` in the task would drop
    * the driver's filesystem settings (S3 credentials, defaultFS…).
    */
  def hadoopConfSupplier(
      sc: SparkContext): () => org.apache.hadoop.conf.Configuration = {
    val ser = new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration)
    () => ser.value
  }
}

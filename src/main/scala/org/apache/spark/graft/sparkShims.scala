package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into `private[spark]` core internals (the sql-side sibling is
  * [[org.apache.spark.sql.graft.shims]]).
  */
object sparkShims {
  /** Block until the listener bus has delivered every queued event.
    * Needed to attribute async listener counts (e.g. per-query job
    * counts in the bench) deterministically — a sleep-until-stable poll
    * misattributes trailing events whenever dispatch pauses longer than
    * the poll interval, i.e. exactly on loaded machines.
    */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded caching for operators that persist internal state but return
  * a lazy DataFrame (so they have no safe point to unpersist at).
  *
  * Each operator owns one slot: persisting a new DataFrame unpersists
  * the previous occupant, so a session that calls the operator N times
  * holds ONE cached copy, not N. Unpersisting a DataFrame that an
  * in-flight query still references is safe in Spark — the query falls
  * back to recomputing the lineage — so the trade is bounded memory for
  * a possible recompute in the concurrent-caller case.
  */
final class CacheSlot {
  private val ref = new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  def persist(df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = ref.getAndSet(cached)
    if (prev != null && (prev ne cached)) prev.unpersist(blocking = false)
    cached
  }

  /** Take ownership of an ALREADY-persisted DataFrame (no extra persist
    * call), releasing the previous occupant. For loops that manage
    * round-over-round persistence themselves and hand over only their
    * final state.
    */
  def register(df: DataFrame): DataFrame = {
    val prev = ref.getAndSet(df)
    if (prev != null && (prev ne df)) prev.unpersist(blocking = false)
    df
  }

  /** Release the slot's current occupant. */
  def clear(): Unit = {
    val prev = ref.getAndSet(null)
    if (prev != null) prev.unpersist(blocking = false)
  }
}

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

  /** Spark's CacheManager keys entries by canonicalized-plan equality,
    * not object identity: persisting a plan equal to the occupant's is
    * a no-op (one shared entry), and unpersisting the old handle would
    * delete that SHARED entry — evicting the cache we just "added". So
    * the previous occupant is only released when its plan genuinely
    * differs from the new one.
    */
  private def release(prev: DataFrame, next: DataFrame): Unit =
    if (prev != null && (prev ne next) &&
      !prev.queryExecution.analyzed.sameResult(next.queryExecution.analyzed))
      // the occupant may belong to an already-stopped session (slots are
      // JVM-global; test suites cycle sessions) — releasing it is then
      // moot, not an error
      try prev.unpersist(blocking = false) catch { case _: Exception => () }

  def persist(df: DataFrame): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    release(ref.getAndSet(cached), cached)
    cached
  }

  /** Take ownership of an ALREADY-persisted DataFrame (no extra persist
    * call), releasing the previous occupant. For loops that manage
    * round-over-round persistence themselves and hand over only their
    * final state.
    */
  def register(df: DataFrame): DataFrame = {
    release(ref.getAndSet(df), df)
    df
  }

  /** Release the slot's current occupant. */
  def clear(): Unit = {
    val prev = ref.getAndSet(null)
    if (prev != null) prev.unpersist(blocking = false)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Bounded caching for operators that persist internal state but return
  * a lazy DataFrame (so they have no safe point to unpersist at).
  *
  * Each operator owns one slot holding up to [[CacheSlot.defaultCapacity]]
  * entries, keyed by CANONICALIZED plan and evicted least-recently-used.
  * Capacity 1 is the original single-occupant behaviour (a session calling
  * the operator N times holds one cached copy, not N); the default of 2
  * exists for the measured concurrent-session case — two sessions driving
  * the SAME operator over DIFFERENT corpora (tools.StressConcurrent
  * phase 2) alternate plans, and a single-occupant slot turns every call
  * into a full recompute. Memory stays bounded at capacity × one artifact
  * per operator, MEMORY_AND_DISK so cold entries degrade to disk blocks
  * rather than executor heap.
  *
  * Unpersisting a DataFrame that an in-flight query still references is
  * safe in Spark — the query falls back to recomputing the lineage — so
  * eviction trades a possible recompute, never a wrong answer.
  */
final class CacheSlot(capacity: Int = CacheSlot.defaultCapacity) {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  /** Access-ordered: iteration starts at the least-recently-used entry.
    * Spark's CacheManager keys entries by canonicalized-plan equality,
    * not object identity, so the map key IS the cache-entry identity:
    * two handles with equal keys share ONE CacheManager entry, and
    * unpersisting either handle would delete that shared entry. All
    * same-key handovers therefore keep the incumbent's storage.
    */
  private val entries =
    new java.util.LinkedHashMap[LogicalPlan, DataFrame](8, 0.75f, true)

  private def keyOf(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed.canonicalized

  /** A hit from an already-stopped session (slots are JVM-global; test
    * suites cycle sessions) must not be returned — its cached blocks
    * died with the session's executors.
    */
  private def usable(hit: DataFrame, caller: DataFrame): Boolean =
    (hit.sparkSession eq caller.sparkSession) &&
      !hit.sparkSession.sparkContext.isStopped

  private def safeUnpersist(df: DataFrame): Unit =
    try df.unpersist(blocking = false) catch { case _: Exception => () }

  /** Evicted keys are unique within the map, so an evicted entry's plan
    * differs from every remaining key and its storage can be released.
    */
  private def evictOverflow(): Unit =
    while (entries.size > capacity) {
      val it = entries.entrySet().iterator()
      safeUnpersist(it.next().getValue)
      it.remove()
    }

  def persist(df: DataFrame): DataFrame = synchronized {
    val key = keyOf(df)
    val hit = entries.get(key)
    if (hit != null && usable(hit, df)) hit
    else {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      entries.put(key, cached) // put counts as access: youngest, never self-evicted
      evictOverflow()
      cached
    }
  }

  /** Take ownership of an ALREADY-persisted DataFrame (no extra persist
    * call), releasing an over-capacity least-recently-used occupant. For
    * loops that manage round-over-round persistence themselves and hand
    * over only their final state. A same-key incumbent's handle is
    * dropped WITHOUT unpersisting (shared CacheManager entry — see
    * [[entries]]).
    */
  def register(df: DataFrame): DataFrame = synchronized {
    entries.put(keyOf(df), df)
    evictOverflow()
    df
  }

  /** Release every occupant. */
  def clear(): Unit = synchronized {
    entries.values().forEach(safeUnpersist(_))
    entries.clear()
  }
}

object CacheSlot {
  /** Entries per operator slot. Overridable for deployments expecting
    * more concurrent same-operator sessions:
    * `-Dgraft.cacheSlot.capacity=N`.
    */
  val defaultCapacity: Int =
    Integer.getInteger("graft.cacheSlot.capacity", 2)
}

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
  * covers the measured concurrent-session case — two sessions driving the
  * SAME operator over DIFFERENT corpora (tools.StressConcurrent phase 2)
  * alternate plans, and a single-occupant slot turns every call into a
  * full recompute. Slots whose entries are SMALL relative to the work
  * they cache (pair lists, per-node aggregates, |Q|·k ground truths)
  * opt into larger capacities explicitly — the verified query surface
  * ships three input variants of each operator family (full + mod-10
  * slice + mod-100 centile gates), and capacity 2 evicts the full-graph
  * artifact exactly when the next full-graph consumer needs it. The
  * default deliberately stays at 2 for everything else: raising it
  * globally to 4 was measured to REGRESS the full 288-query bench
  * (~+20 s wall, v7-class queries up to +250 executor-CPU-s) — the
  * big-artifact slots (probe LUT relations, postings, shingle arrays)
  * overflow the 8 GiB driver's storage pool at 2× retention, hot blocks
  * degrade to serialized disk blocks, and every consumer then pays
  * per-read deserialization. Memory stays bounded at capacity × one
  * artifact per operator, MEMORY_AND_DISK so cold entries degrade to
  * disk blocks rather than executor heap.
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

/** Memoization for operators whose RESULT plan is not derivable from
  * their input plan — iterative loops that end on a checkpoint leaf
  * (label propagation, PageRank): a [[CacheSlot]] keyed on the result's
  * own canonicalized plan can never see two calls produce the same key,
  * because every checkpoint leaf is unique. This memo keys on the
  * (canonicalized INPUT plan, parameter signature) pair instead, so a
  * second consumer of the same edge relation with the same round count
  * reuses the finished state instead of re-running the loop (measured in
  * the r10 bench: g4_label_prop re-ran the identical 3-round LPA that
  * g12_modularity had just completed — ~50 executor-CPU-s of pure
  * duplicate work).
  *
  * Eviction protocol: a checkpointed result has NO lineage, so an evicted
  * entry must not be force-released while a concurrent query might still
  * read it (Verify runs query futures in parallel). Eviction therefore
  * just DROPS the handle: in-flight consumers keep the RDD reference
  * alive, and once the last reference is GC'd Spark's ContextCleaner
  * reclaims the blocks (localCheckpoint) or files (reliable checkpoint —
  * requires `spark.cleaner.referenceTracking.cleanCheckpoints=true`,
  * which [[graft.EngineSession]] sets; a session built elsewhere without
  * it retires evicted checkpoint FILES only at application stop).
  */
final class ResultMemo(capacity: Int = CacheSlot.defaultCapacity) {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  private val entries =
    new java.util.LinkedHashMap[(LogicalPlan, String), DataFrame](8, 0.75f, true)

  /** `compute` runs OUTSIDE the lock: it executes the whole iterative
    * loop (Spark actions included), and holding the memo lock across it
    * would serialize every concurrent caller of the operator — Verify
    * drives queries from parallel futures. The cost is that two
    * concurrent first callers of the SAME key both compute; the loser's
    * state is simply dropped (first put wins, both results are
    * equivalent, ContextCleaner reclaims the orphan).
    */
  def getOrCompute(input: DataFrame, params: String)(
      compute: => DataFrame): DataFrame = {
    val key = (input.queryExecution.analyzed.canonicalized, params)
    def lookup(): DataFrame = synchronized {
      val hit = entries.get(key)
      if (hit != null && (hit.sparkSession eq input.sparkSession) &&
          !hit.sparkSession.sparkContext.isStopped) hit
      else null
    }
    val hit = lookup()
    if (hit != null) hit
    else {
      val result = compute
      synchronized {
        val raced = lookup()
        if (raced != null) raced
        else {
          entries.put(key, result)
          while (entries.size > capacity) {
            val it = entries.entrySet().iterator()
            it.next() // dropped, not released — see the eviction protocol
            it.remove()
          }
          result
        }
      }
    }
  }

  /** Drop every handle (test hygiene between sessions). */
  def clear(): Unit = synchronized(entries.clear())
}

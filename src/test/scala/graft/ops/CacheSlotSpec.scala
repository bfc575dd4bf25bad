package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CacheSlotSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def cachedPlans(df: org.apache.spark.sql.DataFrame): Boolean =
    spark.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isDefined

  test("identical-plan handover keeps the shared cache entry alive") {
    val slot = new CacheSlot
    def make() = Seq(1, 2, 3).toDF("x").select($"x" * 2 as "y")
    val a = slot.persist(make())
    a.count()
    assert(cachedPlans(a))
    // second call with a sameResult plan: Spark shares ONE entry; the
    // slot must NOT release it (the round-2 regression: an identity
    // guard deleted the shared entry right after "adding" it)
    val b = slot.persist(make())
    b.count()
    assert(cachedPlans(b), "handover between identical plans evicted the shared entry")
    slot.clear()
    assert(!cachedPlans(b))
  }

  test("capacity 1: different-plan handover releases the previous occupant") {
    val slot = new CacheSlot(1)
    val a = slot.persist(Seq(1).toDF("x"))
    a.count()
    assert(cachedPlans(a))
    val b = slot.persist(Seq(1, 2).toDF("x"))
    b.count()
    assert(!cachedPlans(a), "previous occupant leaked")
    assert(cachedPlans(b))
    slot.clear()
  }

  test("capacity 2: two corpora coexist; a third evicts the least-recently-used") {
    val slot = new CacheSlot(2)
    val a = slot.persist(Seq(1).toDF("x"))
    val b = slot.persist(Seq(1, 2).toDF("x"))
    a.count(); b.count()
    // the concurrent-session case: alternating plans must BOTH stay
    // cached (a single-occupant slot recomputes every call here)
    assert(cachedPlans(a) && cachedPlans(b))
    assert(slot.persist(Seq(1).toDF("x")) eq a, "same-plan call must return the cached handle")
    // a touched `a` -> `b` is now least-recently-used and must go first
    val c = slot.persist(Seq(1, 2, 3).toDF("x"))
    c.count()
    assert(!cachedPlans(b), "LRU occupant leaked past capacity")
    assert(cachedPlans(a) && cachedPlans(c))
    slot.clear()
    assert(!cachedPlans(a) && !cachedPlans(c))
  }

  test("default capacity is >= 2 (concurrent-session churn bound)") {
    assert(CacheSlot.defaultCapacity >= 2)
  }

  test("ResultMemo: same (input, params) returns the memoized frame; " +
      "different params or input recompute") {
    val memo = new ResultMemo(2)
    var computes = 0
    def run(df: org.apache.spark.sql.DataFrame, p: String) =
      memo.getOrCompute(df, p) { computes += 1; df.localCheckpoint(true) }
    val in = Seq(1, 2, 3).toDF("x")
    val r1 = run(in, "rounds=3")
    assert(computes == 1)
    // identical input PLAN (fresh object) + same params: memo hit
    val r2 = run(Seq(1, 2, 3).toDF("x"), "rounds=3")
    assert(computes == 1)
    assert(r2 eq r1, "equal key must return the memoized handle")
    // same input, different params: a different loop result — recompute
    run(in, "rounds=5")
    assert(computes == 2)
    // different input plan: recompute
    run(Seq(9).toDF("x"), "rounds=3")
    assert(computes == 3)
    memo.clear()
    run(in, "rounds=3")
    assert(computes == 4, "clear() must drop the memoized entries")
    memo.clear()
  }

  test("ResultMemo: capacity bounds the entries, LRU evicted first") {
    val memo = new ResultMemo(2)
    var computes = 0
    def run(n: Int) = memo.getOrCompute(Seq.fill(n)(1).toDF("x"), "p") {
      computes += 1; Seq.fill(n)(1).toDF("x").localCheckpoint(true)
    }
    run(1); run(2)
    assert(computes == 2)
    run(1) // touch: 2 becomes LRU
    assert(computes == 2)
    run(3) // evicts 2
    assert(computes == 3)
    run(1)
    assert(computes == 3, "recently-used entry must survive the eviction")
    run(2)
    assert(computes == 4, "evicted entry must recompute")
    memo.clear()
  }
}

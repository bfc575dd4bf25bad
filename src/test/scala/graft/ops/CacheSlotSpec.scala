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
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** AQE decisions at REAL data sizes (sf0.01 parquet, ~60k-row fact
  * tables): [[PlanQualitySpec]] pins plan SHAPES (what must or must not
  * appear regardless of size), this suite pins what AQE actually DECIDES
  * at runtime for the flagship hint-free queries — the engine policy is
  * "repartition and let AQE choose", so the choices themselves are the
  * contract: small materialized sides convert to broadcast joins, and
  * over-provisioned shuffles coalesce. A regression here (a hint
  * sneaking back, a conversion lost to a changed plan boundary) is
  * invisible to the pre-execution asserts.
  */
class AqeAtSizeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  /** Execute, then return the final adaptive plan. */
  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("v1 at sf0.01: AQE broadcasts the query side of the hint-free cartesian") {
    // 6k queries against 60k corpus vectors: the query side's
    // materialized stage is small, so AQE must convert the non-equi
    // scoring join to a broadcast nested loop — the conversion a static
    // planner can't make safely (fan-out-blind estimates) and the reason
    // the hint was removed
    val p = finalPlan("v1_topk_cosine")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"),
      s"AQE did not broadcast the query side at sf0.01:\n$p")
  }

  test("d2 at sf0.01: candidate joins convert to broadcast, shuffles coalesce") {
    // the candidate-id set is tiny on this corpus (25 near-dup pairs),
    // so the UNHINTED pruning joins must come out broadcast at runtime;
    // the over-provisioned 32-partition shuffles must fold
    val p = finalPlan("d2_minhash_neardup")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"AQE did not broadcast the candidate joins at sf0.01:\n$p")
    assert(p.contains("AQEShuffleRead coalesced"),
      s"no runtime shuffle coalescing:\n$p")
  }

  test("e10 at sf0.01: the bucketed range join broadcasts the small incident side") {
    // incidents (the HAVING >= 5 error-hour side) materialize far
    // smaller than sessions: AQE must pick broadcast for the bucket
    // equi-join, keeping the session side unshuffled past its own agg
    val p = finalPlan("e10_session_incidents")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("__bucket")),
      s"bucket join not broadcast at sf0.01:\n$p")
    assert(p.contains("AQEShuffleRead coalesced"),
      s"no runtime shuffle coalescing:\n$p")
  }

  test("x12 at sf0.01: the salted join stays broadcast and coalesces after salting") {
    // salting multiplies the dim side saltFactor x; AQE must still see a
    // broadcastable materialized size AND fold the fanned-out shuffle
    val p = finalPlan("x12_salted_join")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("_salt")),
      s"salted join not broadcast at sf0.01:\n$p")
    assert(p.contains("AQEShuffleRead coalesced"),
      s"no runtime shuffle coalescing:\n$p")
  }

  test("t19 at sf0.01: the LM model side broadcasts at runtime (vocab ≪ corpus)") {
    // the bigram model is vocabulary-sized (≪ the doc-bigram fan-out);
    // the operator ships it hint-free, so AQE must convert the scoring
    // join to broadcast from the model's materialized size
    val p = finalPlan("t19_lm_score")
    assert(p.contains("isFinalPlan=true"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"LM model join not broadcast at sf0.01:\n$p")
    assert(p.contains("AQEShuffleRead coalesced"),
      s"no runtime shuffle coalescing:\n$p")
  }
}

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

  test("runtime bloom filter: a selective dim filter prunes the fact side pre-shuffle") {
    // the 100 TB fact⋈filtered-dim pattern where broadcast does NOT
    // apply (both sides big): Catalyst's InjectRuntimeFilter plants a
    // bloom filter built from the dim's join keys as a fact-side
    // predicate, so most fact rows die BEFORE the join shuffle instead
    // of crossing the wire to find no partner. Thresholds are sized for
    // real clusters (10 GB application side), so at sf0.01 the trigger
    // conditions are scaled down — the assertion is that the engine's
    // declarative plans leave the rule applicable (equi-join, selective
    // creation-side filter, no hints), not the thresholds themselves.
    val c = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      import org.apache.spark.sql.functions.col
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_totalprice") > 400000) // selective: ~1% of orders
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter on the fact side:\n$p")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => c.set(k, x); case None => c.unset(k) }
    }
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

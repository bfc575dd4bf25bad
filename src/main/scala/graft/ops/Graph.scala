package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over an edge table — the domain-authority
  * signal web-corpus pipelines (CCNet, RefinedWeb) derive from the link
  * graph to gate crawl quality (reference: `/root/reference` has no graph
  * tier; this extends the engine the way §"training-data pipeline"
  * requires).
  *
  * Cross-engine determinism design (the same discipline as
  * `TextAnalysis.lmScore`): ranks live as FIXED-POINT micro-units in a
  * LONG. Every step is integer arithmetic —
  *
  *   - a node's per-edge contribution is `rank_fp div outdeg` (long floor
  *     division; ranks are non-negative by construction);
  *   - the damped update is
  *     `base_fp + (dampingBp * Σ contribs) div 10000` with
  *     `base_fp = ((10000 - dampingBp) * 1e6) div 10000`
  *
  * so the per-iteration sums are sums of LONGs: accumulation order (which
  * Spark and any oracle engine choose differently) cannot move the
  * result, and the fixed iteration count makes the whole computation a
  * pure integer function of the edge set. No float enters at any point.
  *
  * Semantics: classic power iteration with teleport mass `1 - damping`,
  * except dangling-node mass is DROPPED rather than redistributed (each
  * iteration a sink node's rank contributes to nobody). That is a
  * documented, deterministic variant — redistribution would need a
  * global scalar per round (one extra tiny agg) and is not required for
  * the ranking use case, where only relative order matters.
  *
  * Scale shape (the 100 TB contract): each iteration is
  *   edges ⋈ ranks (shuffle on `src`) → groupBy `dst` (shuffle) →
  *   nodes left ⋈ sums (shuffle on `node`)
  * — three key-partitioned exchanges over edge/node-sized relations,
  * nothing driver-side, no collect. The edge+degree relation and the
  * node set are reused every round, so both are persisted for the loop
  * and handed to operator-owned [[CacheSlot]]s (bounded: one copy per
  * operator, not per call). Each round's rank frame is cut from the
  * growing lineage with an eager `localCheckpoint` — the same recipe
  * that took MMR from 56 s to 11 s — so round k's plan does not replay
  * rounds 1..k-1. Checkpoint state is nodes-sized (id + one long), the
  * smallest relation in the computation.
  *
  * Overflow bound: `dampingBp · Σ contribs` must fit a long. Total rank
  * mass is ≤ nodes · 1e6, so a single node absorbing the ENTIRE graph's
  * mass would need ~1e9 nodes × 1e6 × 1e4 ≈ 1e19 to overflow — beyond
  * that, scale `unitFp` down.
  *
  * @param edges      directed edge table
  * @param srcCol     source node id column (string or integral)
  * @param dstCol     destination node id column
  * @param iterations fixed number of power-iteration rounds
  * @param dampingBp  damping factor in basis points (8500 = 0.85)
  * @return (node, rank_fp) — rank in micro-units, initial mass 1e6/node
  */
object Graph {

  private val edgeSlot = new CacheSlot
  private val nodeSlot = new CacheSlot

  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      dampingBp: Int = 8500): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingBp >= 0 && dampingBp <= 10000, "dampingBp is basis points")

    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg): the loop's join input, reused every round
    val ed = edgeSlot.persist(e.join(deg, Seq("src")))
    val nodes = nodeSlot.persist(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())

    val baseFp = ((10000L - dampingBp) * 1000000L) / 10000L
    var ranks = nodes.withColumn("rank_fp", lit(1000000L))
    for (_ <- 1 to iterations) {
      val sums = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst").as("node"), expr("rank_fp div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(baseFp) +
            expr(s"(${dampingBp}L * coalesce(m, 0L)) div 10000")).as("rank_fp"))
        // nodes-sized (id + long); cuts round-k lineage from replaying 1..k-1
        .localCheckpoint(true)
    }
    ranks
  }
}

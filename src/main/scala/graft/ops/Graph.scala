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
  * Semantics: classic power iteration with teleport mass `1 - damping`.
  * By default dangling-node mass is DROPPED rather than redistributed
  * (each iteration a sink node's rank contributes to nobody) — a
  * documented, deterministic variant, sufficient where only relative
  * order matters. `redistributeDangling = true` switches to the
  * textbook variant: each round one tiny scalar agg sums the sink
  * nodes' rank (a sum of longs — order-immune), and every node credits
  * `dangling_fp div N` into its pre-damping sum. The scalar rides a
  * scalar subquery, so it executes once per round, never per row, and
  * the computation stays all-integer either way. Default stays off for
  * bit-compat with the drop variant's oracles.
  *
  * Scale shape (the 100 TB contract): each iteration is
  *   edges ⋈ ranks (shuffle on `src`) → groupBy `dst` (shuffle) →
  *   nodes left ⋈ sums (shuffle on `node`)
  * — three key-partitioned exchanges over edge/node-sized relations,
  * nothing driver-side, no collect. The edge+degree relation and the
  * node set are reused every round, so both are persisted for the loop
  * and handed to operator-owned [[CacheSlot]]s (bounded: one copy per
  * operator, not per call). Each round's rank frame is cut from the
  * growing lineage with an eager [[CheckpointCut.cut]] — the same
  * recipe that took MMR from 56 s to 11 s — so round k's plan does not
  * replay rounds 1..k-1, and retired rounds release their storage as
  * the loop advances. On a cluster, set a checkpoint directory
  * (`sparkContext.setCheckpointDir`) and the round state becomes a
  * RELIABLE checkpoint: losing an executor mid-round-40 of a 100-round
  * job recovers from files instead of failing the query. Checkpoint
  * state is nodes-sized (id + one long), the smallest relation in the
  * computation.
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
  private val inputEdgesSlot = new CacheSlot

  /** Persist a caller-built edge list through the Graph cache slots —
    * for compositions that feed ONE expensive edge derivation (e.g. a
    * co-occurrence join) to SEVERAL graph consumers (label prop +
    * modularity, PageRank + assortativity…). Spark does not
    * common-subexpression the DataFrame DAG, so without this each
    * consumer re-plans the whole edge build; with it they all read one
    * cached artifact (bounded by the slot's LRU like every other
    * operator cache).
    */
  def cacheEdges(edges: DataFrame): DataFrame = inputEdgesSlot.persist(edges)
  private val nodeSlot = new CacheSlot
  private val seedSlot = new CacheSlot
  private val orientSlot = new CacheSlot
  private val hitsOutSlot = new CacheSlot
  private val hitsInSlot = new CacheSlot
  private val hitsNodeSlot = new CacheSlot
  private val linkPredEdgeSlot = new CacheSlot
  private val linkPredAdjSlot = new CacheSlot
  // BFS adjacency (collect_set — no outdeg, so a different plan/entry
  // than the rank loops' edgeSlot; own slot so a BFS can't evict a
  // concurrently-running PageRank's adjacency or vice versa)
  private val bfsAdjSlot = new CacheSlot
  // co-occurrence pair lists (see coOccurrenceEdges) and per-node
  // triangle counts (nodes-sized — the wedge-closing pass they cost is
  // the whole point of keeping them). Capacity 4: these entries are
  // small, and the full + mod-10 slice + mod-100 centile gate variants
  // cycle three plans through each slot before the full-graph consumers
  // return (the CacheSlot scaladoc's small-entry opt-in).
  private val coocSlot = new CacheSlot(4)
  private val triSlot = new CacheSlot(4)
  // finished label-propagation states, keyed by (edge plan, rounds) —
  // a checkpoint leaf can't be keyed by its own plan (see ResultMemo);
  // capacity 4 for the same full/slice/centile variant cycling
  private val lpaMemo = new ResultMemo(4)

  /** Neighbor-list degree cap for the CSR adjacency builders
    * (`-Dgraft.adjacency.degreeCap=N`, default uncapped). The CSR layout
    * stores a vertex's whole neighbor list in ONE row — fine on the
    * verified co-purchase graphs, but at web scale a 1e8-degree hub is a
    * multi-GB row materialized inside a single aggregation buffer/task
    * (guide §2.5 skew). With a cap, every adjacency groups by
    * (key, segment) instead, segment = `pmod(xxhash64(neighbor),
    * ceil(degree/cap))`, so a hub's list splits into ~degree/cap bounded
    * rows BEFORE any array is collected; low-degree vertices keep one
    * segment. Loop consumers are segmentation-oblivious: they join on
    * the vertex key (each segment row receives the round state and
    * explodes only its slice — the union of slices is the whole list)
    * and `outdeg` carries the TRUE degree on every segment row, so
    * per-edge contributions divide correctly. Results are bit-identical
    * (AdjacencyCapSpec pins capped == uncapped on real operators and a
    * bounded max segment size on a synthetic 1e6-degree hub); the
    * default path compiles to exactly the pre-cap plan (no extra join).
    */
  private[graft] def adjacencyDegreeCap: Int =
    Integer.getInteger("graft.adjacency.degreeCap", Int.MaxValue)

  /** Shared CSR adjacency builder — one `groupBy(key)` collect when
    * uncapped, the (key, segment) split under [[adjacencyDegreeCap]].
    */
  private[ops] def groupedAdjacency(
      e: DataFrame,
      key: String,
      value: String,
      outCol: String,
      useSet: Boolean,
      withCount: Boolean): DataFrame = {
    val cap = adjacencyDegreeCap
    def coll =
      if (useSet) collect_set(col(value)) else collect_list(col(value))
    if (cap == Int.MaxValue) {
      if (withCount) e.groupBy(key).agg(coll.as(outCol), count(lit(1)).as("outdeg"))
      else e.groupBy(key).agg(coll.as(outCol))
    } else {
      require(cap >= 1, s"graft.adjacency.degreeCap must be >= 1, got $cap")
      val deg = e.groupBy(key).agg(count(lit(1)).as("__deg"))
      val seg = e.join(deg, Seq(key)).withColumn("__seg",
        expr(s"pmod(xxhash64($value), (__deg + ${cap.toLong - 1}L) div ${cap.toLong}L)"))
      val g = seg.groupBy(col(key), col("__seg"))
      val out =
        if (withCount) g.agg(coll.as(outCol), max(col("__deg")).as("outdeg"))
        else g.agg(coll.as(outCol))
      out.drop("__seg")
    }
  }

  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      dampingBp: Int = 8500,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingBp >= 0 && dampingBp <= 10000, "dampingBp is basis points")

    // type-preserving: node ids keep the caller's column type (integral
    // ids hash/shuffle/sort several times cheaper than strings — prefer
    // them at scale; disjoint ranges, e.g. 2k/2k+1, fold two entity
    // families into one long key space)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    require(e.schema(0).dataType == e.schema(1).dataType,
      s"src/dst types differ: ${e.schema(0).dataType} vs ${e.schema(1).dataType}")
    // Adjacency-list (CSR-style) layout, built ONCE: one shuffle groups
    // the edge relation to (src, dsts[], outdeg) — nodes-sized, cached,
    // and HASH-PARTITIONED on src by the groupBy itself. Every round
    // then joins two NODES-sized relations and regenerates the edge
    // fan-out in-pipeline with explode: no per-round scan of an
    // edges-sized cache, no per-round sort. (Degree skew caveat: a
    // vertex's neighbor array lives in one row — web-scale hot vertices
    // with 1e8 in-links would need the standard split-vertex/salting
    // treatment before this layout.)
    val adj = edgeSlot.persist(
      groupedAdjacency(e, "src", "dst", "dsts", useSet = false, withCount = true))
    // node set DERIVED FROM the cached adjacency (sources + one explode
    // of the neighbor arrays) — deriving it from `e` instead would
    // recompute the caller's whole edge plan twice more
    val nodes = nodeSlot.persist(
      adj.select(col("src").as("node"))
        .union(adj.select(explode(col("dsts")).as("node"))).distinct())

    val baseFp = ((10000L - dampingBp) * 1000000L) / 10000L
    // dangling redistribution needs the node count as a divisor; ONE
    // driver-side scalar off the cached node set, fetched only when the
    // flag is on (default path ships nothing to the driver)
    val nNodes = if (redistributeDangling) nodes.count() else 0L
    var ranks = nodes.withColumn("rank_fp", lit(1000000L))
    for (_ <- 1 to iterations) {
      val prev = ranks
      // SHUFFLE_HASH on the rank side: the checkpointed rank frame has
      // no catalyst stats, so the unhinted plan degenerates to a
      // per-round SortMergeJoin. Hash-building per partition instead
      // streams the adjacency unsorted — and unlike a broadcast hint it
      // stays valid when the node set is 1e9 (each partition builds
      // |nodes|/shuffle-partitions entries, not all). The per-source
      // contribution divides ONCE, then explode fans it out to the
      // neighbors; the groupBy's map-side partial sums collapse the
      // fan-out back to ≤ |nodes| rows per partition before the exchange
      val sums = adj.join(ranks.hint("shuffle_hash"), adj("src") === ranks("node"))
        .select(explode(col("dsts")).as("node"), expr("rank_fp div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      // dangling-mass redistribution (flag; default OFF for bit-compat
      // with the documented drop variant): the round's sink mass is ONE
      // tiny scalar agg — sum of rank over nodes with no out-edges —
      // inlined as a scalar subquery (executes once per round, never a
      // per-row join), every node crediting `dangling_fp div N` into its
      // pre-damping sum. Still all-integer: the scalar is a sum of
      // longs (order-immune) and the share a long floor division.
      val share =
        if (!redistributeDangling) lit(0L)
        else org.apache.spark.sql.graft.shims.scalarSubquery(
          ranks.join(adj.select(col("src").as("node")), Seq("node"), "left_anti")
            .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("dang"))
            .select(expr(s"dang div ${nNodes}L").as("share_fp")))
      ranks = CheckpointCut.cut(nodes.join(sums, Seq("node"), "left")
        .select(col("node"), (coalesce(col("m"), lit(0L)) + share).as("m2"))
        .select(col("node"),
          (lit(baseFp) +
            expr(s"(${dampingBp}L * m2) div 10000")).as("rank_fp")))
      // nodes-sized (id + long); the cut keeps round-k lineage from
      // replaying 1..k-1, and the retired round's state (blocks or
      // checkpoint files) is released once the new round is materialized
      CheckpointCut.release(prev)
    }
    ranks
  }

  /** Personalized PageRank (Haveliwala 2002): the teleport vector
    * concentrates on a SEED set instead of spreading uniformly — rank
    * measures proximity to the seeds, the primitive under seed-expanded
    * crawl frontiers ("find more pages like these trusted ones"),
    * related-entity retrieval, and local community scoring.
    *
    * Same all-integer fixed-point discipline as [[pageRank]]: seeds
    * start with 1e6 micro-units and everyone else 0; each round a node's
    * rank is `base + (dampingBp · Σ contribs) div 10000` where `base` is
    * the uniform teleport share for seed nodes and ZERO for non-seeds.
    * Total teleport mass stays |seeds|·(1-d)·1e6 per round — the exact
    * personalized analogue of the uniform variant — and every sum is a
    * sum of longs, so accumulation order cannot move a bit and a SQL
    * oracle replays the rounds exactly. Dangling mass is dropped (the
    * [[pageRank]] default; PPR consumers rank by proximity order).
    *
    * Scale shape: identical loop to [[pageRank]] — shared adjacency/node
    * slots (same edge plan → same cached artifact), three key-partitioned
    * exchanges per round, nodes-sized checkpoint state. The seed FLAG
    * joins into the node relation ONCE before the loop (left-semi shape,
    * not per-round): rounds never touch the seed table again.
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int = 3,
      dampingBp: Int = 8500): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingBp >= 0 && dampingBp <= 10000, "dampingBp is basis points")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    require(e.schema(0).dataType == e.schema(1).dataType,
      s"src/dst types differ: ${e.schema(0).dataType} vs ${e.schema(1).dataType}")
    val adj = edgeSlot.persist(
      groupedAdjacency(e, "src", "dst", "dsts", useSet = false, withCount = true))
    val plainNodes = nodeSlot.persist(
      adj.select(col("src").as("node"))
        .union(adj.select(explode(col("dsts")).as("node"))).distinct())
    // seed flag folded into the node relation ONCE (nodes-sized, cached
    // for the loop in its own slot — flagged nodes are a different plan
    // than pageRank's and must not evict the shared plain node set)
    val nodes = seedSlot.persist(
      plainNodes.join(
          seeds.select(col(seedCol).as("node")).distinct()
            .withColumn("is_seed", lit(true)),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed")))

    val baseFp = ((10000L - dampingBp) * 1000000L) / 10000L
    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("rank_fp"))
    for (_ <- 1 to iterations) {
      val prev = ranks
      val sums = adj.join(ranks.hint("shuffle_hash"), adj("src") === ranks("node"))
        .select(explode(col("dsts")).as("node"), expr("rank_fp div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      ranks = CheckpointCut.cut(nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(baseFp)).otherwise(lit(0L)) +
            expr(s"(${dampingBp}L * coalesce(m, 0L)) div 10000")).as("rank_fp")))
      CheckpointCut.release(prev)
    }
    ranks
  }

  /** Synchronous label propagation (Raghavan et al. 2007), fixed-round
    * deterministic form — community detection over an undirected edge
    * table (content clusters from similarity graphs, account rings from
    * interaction graphs).
    *
    * Round 0 labels every node with its own id; each round relabels v
    * with the most frequent label among its NEIGHBORS, ties to the
    * smallest label, isolated/unreached nodes keeping their label. The
    * argmax is `max(struct(count, -label))` — lexicographic struct max
    * IS (count DESC, label ASC), computed entirely map-side-partial —
    * and because the update is a pure function of the previous label
    * relation, a fixed round count replays exactly in SQL (row_number
    * argmax per round). Asynchronous/randomized LPA variants converge
    * faster but are order-dependent; the synchronous form is the one an
    * oracle can check, and its known oscillation risk on bipartite
    * structure is bounded by the fixed round budget (callers on
    * two-mode graphs should project to one mode first — see
    * [[coOccurrenceEdges]]).
    *
    * Scale shape: identical to [[pageRank]] — the CSR-style adjacency
    * builds once into the shared slot (same plan → same cache entry),
    * each round joins two nodes-sized relations (rank side
    * shuffle-hash), fan-out regenerates in-pipeline via explode, label
    * counts collapse map-side before the exchange, and each round's
    * labels checkpoint eagerly so round k never replays 1..k-1.
    *
    * @return (node, community)
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // the finished state is a pure function of (edge relation, rounds):
    // a second consumer of the same graph (e.g. a modularity score over
    // the communities, then the standalone community query) reuses the
    // converged labels instead of re-running every round
    lpaMemo.getOrCompute(e, s"lpa:rounds=$rounds") {
      val adj = edgeSlot.persist(
        groupedAdjacency(e, "src", "dst", "dsts", useSet = false, withCount = true))
      val nodes = nodeSlot.persist(
        adj.select(col("src").as("node"))
          .union(adj.select(explode(col("dsts")).as("node"))).distinct())
      var labels = nodes.withColumn("label", col("node").cast("long"))
      for (_ <- 1 to rounds) {
        val prev = labels
        val counts = adj.join(labels.hint("shuffle_hash"), adj("src") === labels("node"))
          .select(explode(col("dsts")).as("node"), col("label"))
          .groupBy("node", "label").agg(count(lit(1)).as("c"))
        val winners = counts.groupBy("node")
          .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("m"))
          .select(col("node"), (-col("m.neg")).as("label"))
        labels = CheckpointCut.cut(nodes.join(winners, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("label"), col("node").cast("long")).as("label")))
        CheckpointCut.release(prev)
      }
      labels.select(col("node"), col("label").as("community"))
    }
  }

  /** Multi-source BFS shortest hop distance, bounded depth — "how far is
    * every node from this seed set" (influence radius, crawl frontier
    * depth, link-distance features for graph-quality gates).
    *
    * Level-synchronous frontier expansion: round d joins the previous
    * frontier against the edge table, anti-joins everything already
    * labeled, and labels the survivors d. Because expansion is
    * breadth-first, the FIRST label a node receives is its minimum hop
    * distance — a pure function of the graph, replayable by a recursive
    * SQL engine as `MIN(depth)` over the reachability closure.
    *
    * Scale shape: the CSR-style adjacency builds ONCE into a cache slot,
    * hash-partitioned on the source key by its own groupBy — so each
    * round's equi-join re-exchanges only the frontier (shuffle-hash-built:
    * no stats after a checkpoint, and a broadcast hint would die at 1e9
    * nodes), the neighbor fan-out regenerating in-pipeline via explode
    * into the distinct's map-side partial agg + one anti-join, all
    * nodes-sized; frontier and label relations are
    * eagerly checkpointed so round k never replays rounds 1..k-1. The
    * per-round `isEmpty` early-exit ships ONE boolean to the driver,
    * never data. Unreached nodes are absent from the result (no
    * sentinel ∞ row — the caller left-joins if it wants one).
    *
    * @param maxHops inclusive depth bound; also the round bound, so a
    *                1000-hop chain costs 1000 rounds — BFS depth, not
    *                graph size, is this operator's latency axis
    * @return (node, hops) with hops in [0, maxHops], seeds at 0
    */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // CSR-style adjacency, built ONCE and cached hash-partitioned on
    // src by the groupBy itself (collect_set: parallel edges carry no
    // BFS information). Joining the raw edge list instead re-exchanges
    // the whole edges-sized relation EVERY round — measured on the
    // sf0.1 co-purchase graph (g17, 1.17M-edge bipartite): 12 rounds ×
    // ~5 executor-CPU-s of pure edge re-shuffle, 55 of the query's
    // 67 CPU-s. With the cached partitioning satisfying the join's
    // distribution, each round shuffles only the frontier.
    val adj = bfsAdjSlot.persist(
      groupedAdjacency(e, "src", "dst", "dsts", useSet = true, withCount = false))
    // BFS levels are APPEND-ONLY and pairwise disjoint (the anti-join
    // guarantees a node enters exactly one level), so the known set is
    // kept as the list of materialized LEVEL frames instead of being
    // re-materialized as one growing cut per round — that rewrite cost
    // one extra checkpoint job AND an O(|known|) write every round
    // (O(V·depth) total state writes over a traversal). The per-round
    // anti-join consumes the lazy union of the level leaves, which
    // shuffles the same rows the materialized cut shuffled (a checkpoint
    // leaf carries no partitioning into the join either way) without the
    // write. Levels all back the returned union — nothing to release.
    val hop0 = CheckpointCut.cut(seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("hops", lit(0L)))
    var levels = List(hop0)
    var frontier = hop0.select("node")
    var d = 0L
    while (d < maxHops && !frontier.isEmpty) {
      d += 1
      val known = levels.map(_.select("node")).reduce(_ union _)
      val next = CheckpointCut.cut(
        adj.join(frontier.hint("shuffle_hash"), adj("src") === frontier("node"))
          .select(explode(col("dsts")).as("node")).distinct()
          .join(known, Seq("node"), "left_anti")
          .withColumn("hops", lit(d)))
      levels ::= next
      frontier = next.select("node")
    }
    levels.reduce(_ unionByName _)
  }

  /** Double-sweep diameter lower bound (the standard BFS heuristic —
    * Magnien/Latapy/Habib 2009): BFS from a deterministic seed (the
    * smallest node id), then BFS again from the farthest node found —
    * the second eccentricity is a lower bound on the diameter, usually
    * tight on real graphs, at the cost of exactly TWO traversals (the
    * exact diameter is all-pairs BFS — wrong tool past toy scale; this
    * is the one-number "how stretched is this graph" triage before
    * paying for anything iterative).
    *
    * Deterministic end to end: min-id seed, farthest = (max hops, min
    * node id) struct-extreme, both sweeps the same checkpoint-cut
    * level-synchronous rounds as [[bfsHops]]. `maxHops` bounds both
    * sweeps — a bound BELOW the true eccentricity truncates (the
    * bounded-round contract every iterative operator here carries).
    *
    * @return one row: (seed_node, far_node, ecc_seed, diameter_lb,
    *         n_reached — nodes within maxHops of far_node)
    */
  def diameterDoubleSweep(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxHops: Int): DataFrame = {
    // the rounds themselves hit [[bfsHops]]'s cached CSR adjacency, but
    // the RAW edge list still feeds the seed scan AND the adjacency
    // build — without this slot a derived edge list (e.g. the
    // orders⋈lineitem co-purchase projection) re-plans for each
    // (the g1 adjacency-slot lesson; measured 13.3 s → ~5 s at sf0.1);
    // both sweeps share ONE adjacency entry (identical canonicalized plan)
    val e = diamEdgeSlot.persist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val seed = e.select(least(col("src"), col("dst")).as("s"))
      .agg(min(col("s")).as("s"))
    val d1 = bfsHops(e, "src", "dst", seed, "s", maxHops)
    val farEcc = d1.agg(
      min(struct((-col("hops")).as("nh"), col("node").as("node"))).as("b"))
      .select(col("b.node").as("far_node"), (-col("b.nh")).as("ecc_seed"))
    val d2 = bfsHops(e, "src", "dst",
      farEcc.select(col("far_node").as("s")), "s", maxHops)
    seed.crossJoin(farEcc)
      .crossJoin(d2.agg(max(col("hops")).as("diameter_lb"),
        count(lit(1)).as("n_reached")))
      .select(col("s").as("seed_node"), col("far_node"), col("ecc_seed"),
        col("diameter_lb"), col("n_reached"))
  }

  /** Edge churn between two snapshots of a graph — the link-graph
    * drift monitor (how much of last month's co-purchase structure
    * survived? did a crawl's link graph turn over?). All-integer set
    * arithmetic over canonicalized (min, max) undirected edges; one
    * full-outer join of the two distinct edge sets.
    *
    * @return one row: (n_a, n_b, n_retained, n_added, n_removed,
    *         jaccard_bp — stability of the edge set)
    */
  def edgeChurn(
      edgesA: DataFrame,
      edgesB: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    def canon(df: DataFrame, flag: String) =
      df.select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"))
        .distinct().withColumn(flag, lit(1))
    canon(edgesA, "in_a").join(canon(edgesB, "in_b"), Seq("u", "v"), "full_outer")
      .agg(
        sum(coalesce(col("in_a"), lit(0))).cast("long").as("n_a"),
        sum(coalesce(col("in_b"), lit(0))).cast("long").as("n_b"),
        sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("in_a").isNull && col("in_b").isNotNull, 1L)
          .otherwise(0L)).as("n_added"),
        sum(when(col("in_a").isNotNull && col("in_b").isNull, 1L)
          .otherwise(0L)).as("n_removed"))
      .withColumn("jaccard_bp",
        expr("""CASE WHEN n_a + n_b - n_retained > 0 THEN
                  (10000 * n_retained) div (n_a + n_b - n_retained) END"""))
  }

  private val diamEdgeSlot = new CacheSlot
  // Bellman-Ford's weighted edge list (flat (src, dst, w) — a different
  // shape than the CSR adjacency slots)
  private val weightedEdgeSlot = new CacheSlot

  /** Per-seed BFS hop distances, bounded depth — [[bfsHops]] with seed
    * IDENTITY preserved: each seed runs its own level-synchronous
    * expansion, all seeds advancing together in one join per round.
    *
    * Frontier layout is the MS-BFS bitmask form (Then et al., VLDB
    * 2015): seeds get dense bit indices, round state is
    * `(node, word_idx, mask LONG)` — 64 seeds per word — and a round is
    * adjacency-join → explode → `bit_or` aggregate, with the new-bit
    * mask `m & ~known` deciding both the next frontier and the hop
    * stamp. The previous `(seed, node)`-pair frontier exploded the
    * adjacency once PER SEED sharing a node: at sf0.1/g15 the hop-3
    * round shuffled 13.06M pair rows to produce ~600k new entries
    * (tools.ProfileStages: 24 of the query's 37 warm CPU-s in that one
    * explode+distinct). The bitmask frontier explodes each frontier
    * NODE once regardless of how many seeds sit on it and the map-side
    * `bit_or` partials collapse to ≤ |touched nodes|·words rows per
    * task before the exchange — frontier volume is bounded by the node
    * set, not the seed×node cross. Per-seed rows exist only in the
    * final decode (set bits → `(seed, node, hops)`), which emits
    * exactly the true output size.
    *
    * Determinism: bit assignment is `row_number() ORDER BY seed`
    * (total order), `bit_or` is order-immune, and a bit enters the
    * known mask exactly at its level-synchronous BFS depth — the
    * decoded rows are the same exact (seed, node, hops) set as the
    * pair-frontier form, which the GraphSpec hand-computed cases and
    * the g15 hash oracle pin.
    *
    * State is |reachable|·words rows per round — this is the LANDMARK
    * contract: pick a bounded seed panel (the candidates whose
    * centrality you are ranking), never the full node set (that would
    * be all-pairs BFS, O(n·m) — wrong tool at any scale). The one
    * driver-side piece is the row_number window over the SEED PANEL
    * (single-partition sort of the panel only — bounded by the same
    * contract).
    *
    * @return (seed, node, hops), hops in [0, maxHops], self at 0
    */
  def seededDistances(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // same CSR-once shape as [[bfsHops]] (shared slot — identical edge
    // plans, e.g. a diameter sweep and a landmark panel over one graph,
    // share ONE cached adjacency); each round exchanges only the
    // node-keyed bitmask frontier, never the edge relation
    val adj = bfsAdjSlot.persist(
      groupedAdjacency(e, "src", "dst", "dsts", useSet = true, withCount = false))
    // dense bit index per seed, deterministic (panel-sized window);
    // cut once — both the hop-0 state and the final decode read it
    val seedMap = CheckpointCut.cut(
      seeds.select(col(seedCol).as("seed")).distinct()
        .withColumn("idx",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("seed"))).cast("long") - 1L)
        .select(col("seed"), col("idx"),
          expr("idx div 64").as("word_idx"),
          expr("shiftleft(1L, cast(idx % 64 as int))").as("mask")))
    // hop-0: each seed node owns its own bit (seeds are distinct, so no
    // two rows share (node, word_idx) yet — no merge needed).
    // The known-mask state is kept as the list of materialized LEVEL
    // frames (new bits per round are disjoint from all earlier bits by
    // the `m & ~known` construction), aggregated lazily per round with
    // one bit_or — the old shape re-MATERIALIZED the merged mask table
    // every round (an extra checkpoint job + an O(|known|) write per
    // round, O(V·words·depth) total), while the lazy union shuffles the
    // same rows into the round join that the materialized leaf shuffled
    // (a checkpoint carries no partitioning into the join either way).
    // Level frames all back the returned decode — nothing to release.
    val hop0 = CheckpointCut.cut(
      seedMap.select(col("seed").as("node"), col("word_idx"), col("mask")))
    val levelMasks = scala.collection.mutable.ArrayBuffer[DataFrame](hop0)
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](
      hop0.withColumn("hops", lit(0L)))
    var frontier: DataFrame = hop0
    var d = 0L
    while (d < maxHops && !frontier.isEmpty) {
      d += 1
      val known = levelMasks.reduce(_ unionByName _)
        .groupBy("node", "word_idx").agg(expr("bit_or(mask)").as("mask"))
      // one adjacency explode per frontier NODE; bit_or partials
      // collapse the fan-out map-side before the exchange
      val contrib = adj
        .join(frontier.hint("shuffle_hash"), adj("src") === frontier("node"))
        .select(explode(col("dsts")).as("node"), col("word_idx"), col("mask"))
        .groupBy("node", "word_idx").agg(expr("bit_or(mask)").as("m"))
      val next = CheckpointCut.cut(contrib
        .join(known.withColumnRenamed("mask", "k"), Seq("node", "word_idx"), "left")
        .select(col("node"), col("word_idx"),
          expr("m & ~coalesce(k, 0L)").as("mask"))
        .where(col("mask") =!= 0L))
      levelMasks += next
      levels += next.withColumn("hops", lit(d))
      frontier = next
    }
    // decode set bits to (seed, node, hops): emit only the bits that
    // are actually set (never a 64-way join fan-out), then attach seed
    // identity via the panel-sized map
    val allLevels = levels.reduce(_ unionByName _)
    allLevels
      .select(col("node"), col("hops"),
        explode(expr(
          "transform(filter(sequence(0, 63), b -> ((mask >> b) & 1) = 1), " +
            "b -> word_idx * 64 + cast(b as bigint))")).as("seed_idx"))
      .join(broadcast(seedMap.select(col("seed"), col("idx").as("seed_idx"))),
        Seq("seed_idx"))
      .select(col("seed"), col("node"), col("hops"))
  }

  /** Closeness + harmonic centrality of a landmark panel (Bavelas 1950;
    * Boldi & Vigna 2014 for the harmonic form) within a bounded
    * horizon — "which of these candidate hubs reaches the graph
    * fastest". Harmonic is the robust variant on disconnected graphs
    * (unreached nodes contribute zero instead of poisoning the mean),
    * which is why both are reported.
    *
    * Determinism: distances are exact BFS integers; harmonic is
    * `Σ 1e6 div d` floored micro-units and closeness
    * `(1e6·n_reached) div Σd` — one integer division each, so every
    * output is an exact LONG any engine replays. The horizon bound
    * makes this "centrality within maxHops" — the standard practical
    * definition at web scale, where full-diameter BFS per landmark is
    * neither affordable nor informative.
    *
    * @return (seed, n_reached, sum_hops, harmonic_fp, closeness_fp);
    *         n_reached excludes the seed itself; closeness_fp NULL for
    *         an isolated seed (never a division crash)
    */
  def closenessCentrality(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int): DataFrame =
    seededDistances(edges, srcCol, dstCol, seeds, seedCol, maxHops)
      .groupBy("seed")
      .agg(
        (count(lit(1)) - 1).as("n_reached"),
        sum(col("hops")).as("sum_hops"),
        sum(when(col("hops") > 0, expr("1000000L div hops")).otherwise(0L))
          .as("harmonic_fp"))
      .withColumn("closeness_fp",
        when(col("sum_hops") > 0,
          expr("(1000000L * n_reached) div sum_hops")))

  /** Co-occurrence graph construction: undirected entity pairs sharing
    * at least `minShared` distinct items — the similarity-graph builder
    * behind co-purchase, co-citation, and shared-shingle graphs (the
    * same inverted-index shape as `Dedup.ngramJaccardPairs`: group by
    * item, pair within the group, never all-pairs).
    *
    * Hub guard: an item shared by f entities fans out C(f,2) pairs —
    * quadratic in the hot item, the classic co-occurrence blow-up.
    * `maxItemEntities` DROPS items above that frequency before pairing
    * (the standard practice: a stop-item shared by everyone carries no
    * similarity signal anyway). Default keeps everything; SET IT at
    * corpus scale. The pair aggregation itself is map-side partial, so
    * surviving fan-out collapses before the exchange.
    *
    * @return (src, dst, n_shared) with src < dst, one row per pair
    */
  def coOccurrenceEdges(
      rel: DataFrame,
      entityCol: String,
      itemCol: String,
      minShared: Long = 2L,
      maxItemEntities: Long = Long.MaxValue): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val r = rel.select(col(entityCol).as("e"), col(itemCol).as("i")).distinct()
    val kept =
      if (maxItemEntities == Long.MaxValue) r
      else r.join(
        r.groupBy("i").agg(count(lit(1)).as("n"))
          .where(col("n") > maxItemEntities).select("i"),
        Seq("i"), "left_anti")
    val a = kept.select(col("i"), col("e").as("src"))
    val b = kept.select(col("i"), col("e").as("dst"))
    // The pair join is the expensive half of every co-occurrence-graph
    // statistic, and one session typically runs SEVERAL of them over the
    // same relation (triangles, communities, modularity, assortativity,
    // clustering coefficient — five consumers of one co-purchase graph in
    // the verified surface). Self-cache the output so the second consumer
    // reads pairs instead of re-running the inverted-index join; entry
    // size is the pair list itself (hub-guard-bounded), MEMORY_AND_DISK.
    coocSlot.persist(
      a.join(b, Seq("i")).where(col("src") < col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= minShared))
  }

  /** Per-node triangle counts over an undirected graph — the local
    * clustering signal (community density, spam-farm detection, the
    * numerator of the clustering coefficient).
    *
    * The plan is the degree-ordered node-iterator (Schank & Wagner
    * 2005; MapReduce form Suri & Vassilvitskii 2011): orient every edge
    * from its lower-(degree, id) endpoint to the higher, enumerate
    * wedges as pairs of OUT-neighbors of a common apex, and close them
    * against the oriented edge list. The orientation is what makes
    * this scale: out-degree under it is O(√m) regardless of raw degree
    * skew — a 1e6-degree hub generates wedges only from edges where
    * the hub is the LOW endpoint, so the wedge volume is Σ outdeg² ≈
    * m^1.5, never the Σ deg² of the naive neighbor join. Each triangle
    * is counted exactly once (its apex is its (deg, id)-minimum), and
    * the wedge pair ordering equals the edge orientation, so the
    * closing lookup is one equi-join on (v, w).
    *
    * Three exchanges total: degree agg, wedge self-join on the apex,
    * closing join on the wedge endpoints; the oriented edge relation is
    * consumed three times so it is persisted via an operator-owned
    * [[CacheSlot]] (the upstream edge plan — often a co-occurrence
    * mining join — must not replay per consumer).
    *
    * Input edges may be directed, duplicated, or self-looped: rows
    * normalize to distinct undirected pairs first. Nodes in no
    * triangle are absent from the output (count 0).
    *
    * @return (node, n_triangles)
    */
  /** Weighted single-source (or multi-source) shortest path — bounded
    * Bellman–Ford, the weighted complement of [[bfsHops]] (which counts
    * edges; this sums a cost column: latency graphs, toll/route costs,
    * minimum-cost reach in a trade network).
    *
    * Determinism design: weights are LONG (callers quantize money/time
    * to integer units first), distances are LONG sums, and each round is
    * the pure relaxation
    *
    *   `dist_k(v) = min(dist_{k-1}(v), min over edges (u,v) of
    *                    dist_{k-1}(u) + w(u,v))`
    *
    * — a min over exact integers, immune to accumulation order, so an
    * independent engine replays the rounds bit-for-bit by unrolling them
    * (the g1/g4 oracle recipe). After k rounds, dist(v) is exactly the
    * cheapest path of ≤ k edges — a well-defined result even when the
    * round budget is below the graph's diameter (and the reason there is
    * no early-exit nondeterminism to document).
    *
    * Scale shape: each round is ONE equi-join of the edge relation
    * against the nodes-sized distance relation (shuffle-hash on the
    * stats-less checkpointed side — broadcast would die at 1e9 nodes)
    * followed by a map-side-partial min aggregate; round state is
    * checkpoint-cut ([[CheckpointCut]]: reliable files when a checkpoint
    * dir is set, executor-local blocks otherwise) and retired rounds are
    * released eagerly. Rounds, not graph size, are the latency axis.
    * Negative weights are UNSUPPORTED (not checked — a validation scan
    * would cost a full edge pass): the ≤ k-edge-path semantics stay
    * well-defined, but the result is no longer "shortest path" once a
    * negative cycle exists; callers own the non-negativity contract the
    * way they own integer quantization.
    *
    * @param maxRounds relaxation rounds (≥ 0); distances are exact for
    *                  all paths of at most this many edges
    * @return (node, dist) for nodes reachable within `maxRounds` edges;
    *         seeds at 0, unreached nodes absent (caller left-joins for ∞)
    */
  def ssspBellmanFord(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0, got $maxRounds")
    // the weighted edge relation feeds EVERY relaxation round — uncached,
    // each round re-runs the caller's whole edge build (g6: the
    // orders⋈lineitem join + symmetrize + weight agg re-ran 3×, ~8 of the
    // query's 14 cold CPU-s). Same slot discipline as every other loop.
    val e = weightedEdgeSlot.persist(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(weightCol).cast("long").as("w"))
        .where(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull))
    var dist = CheckpointCut.cut(seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)))
    var r = 0
    while (r < maxRounds) {
      r += 1
      val relaxed = e.join(dist.hint("shuffle_hash"), e("src") === dist("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val prev = dist
      dist = CheckpointCut.cut(
        prev.unionAll(relaxed).groupBy("node").agg(min("dist").as("dist")))
      CheckpointCut.release(prev)
    }
    dist
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): score candidate
    * node pairs by their shared neighbors, each common neighbor w
    * contributing `1 / ln(deg(w))` — rare shared neighbors are strong
    * evidence, hubs are weak evidence. The standard similar-entity /
    * missing-link signal over co-purchase, co-citation, and
    * shared-reference graphs.
    *
    * Determinism: the per-center contribution becomes fixed-point
    * micro-units ONCE — `round(10⁶ / ln(deg))` as LONG via the same
    * double tree in any engine (one exact-integer-double cast, one ln,
    * one divide, one round — the t19 recipe) — and pair scores are then
    * integer sums, immune to accumulation order. Only centers with
    * deg ≥ 2 can be common neighbors, so `ln(deg) > 0` always.
    *
    * Scale shape: the inverted-index wedge join ([[coOccurrenceEdges]]'
    * shape): adjacency grouped by center, pairs generated within the
    * group, NEVER all-pairs of nodes; the pair aggregate is map-side
    * partial, so wedge fan-out collapses before the exchange. Wedges
    * are quadratic in center degree — `maxDegree` DROPS super-hub
    * centers before pairing (standard AA practice: a hub's 1/ln(deg)
    * weight is near-noise anyway; set it at corpus scale). Existing
    * edges are anti-joined out (link PREDICTION proposes new links);
    * the global top-k is TakeOrderedAndProject, never a full sort.
    *
    * @param maxDegree hub guard — centers with more neighbors are
    *                  dropped before the quadratic wedge fan-out
    * @param topK      pairs kept, ordered (score_fp DESC, a ASC, b ASC)
    * @return (a, b, n_common, score_fp) with a < b
    */
  def adamicAdar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDegree: Long = Long.MaxValue,
      topK: Int = 100): DataFrame = {
    require(topK > 0, "topK must be positive")
    // e0 feeds the adjacency AND the final anti-join, and viaCenter
    // feeds both wedge sides — slot-cached or the caller's edge build
    // (often a join) would replay per consumer
    val e0 = linkPredEdgeSlot.persist(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val adj = e0.select(explode(array(
        struct(col("a").as("w"), col("b").as("n")),
        struct(col("b").as("w"), col("a").as("n")))).as("x"))
      .select(col("x.w").as("w"), col("x.n").as("n"))
    val centers = adj.groupBy("w").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= 2L && col("deg") <= maxDegree)
      .select(col("w"),
        expr("CAST(ROUND(1000000 / LN(CAST(deg AS DOUBLE))) AS BIGINT)").as("w_fp"))
    val viaCenter = linkPredAdjSlot.persist(adj.join(centers, Seq("w")))
    val pairs = viaCenter.select(col("w"), col("n").as("n1"), col("w_fp"))
      .join(viaCenter.select(col("w"), col("n").as("n2")), Seq("w"))
      .where(col("n1") < col("n2"))
      .groupBy(col("n1").as("a"), col("n2").as("b"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("score_fp"))
    pairs.join(e0, Seq("a", "b"), "left_anti")
      .orderBy(col("score_fp").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** Neighborhood-Jaccard link prediction — [[adamicAdar]]'s unweighted
    * sibling: score candidate pairs by `|N(a)∩N(b)| / |N(a)∪N(b)|`.
    * Where AA rewards RARE shared neighbors, Jaccard normalizes by how
    * much of both neighborhoods is shared — the better signal when
    * degrees vary wildly and a few shared neighbors between two small
    * nodes mean more than many between two hubs.
    *
    * Fully integer: `jaccard_bp = (10000·n_common) div (deg_a + deg_b −
    * n_common)` — no ln, no float anywhere, bit-portable with no
    * caveats. The `maxDegree` hub guard removes super-hub CENTERS from
    * the whole computation (both the wedge counts and the degrees — the
    * induced subgraph semantics, so numerator and denominator stay
    * consistent); unlike AA there is no deg ≥ 2 floor (nothing divides
    * by ln(deg)).
    *
    * Scale shape: identical to [[adamicAdar]] — inverted-index wedge
    * join grouped by center (never all-pairs), map-side-partial pair
    * aggregate, degree join on the nodes-sized relation, existing edges
    * anti-joined out, TakeOrderedAndProject top-k.
    *
    * @return (a, b, n_common, deg_a, deg_b, jaccard_bp) with a < b
    */
  def jaccardLinks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxDegree: Long = Long.MaxValue,
      topK: Int = 100): DataFrame = {
    require(topK > 0, "topK must be positive")
    // same multi-consumer shape as adamicAdar: e0 (adjacency + final
    // anti-join) and adjE (degrees + both wedge sides) are slot-cached
    val e0 = linkPredEdgeSlot.persist(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val adj = e0.select(explode(array(
        struct(col("a").as("w"), col("b").as("n")),
        struct(col("b").as("w"), col("a").as("n")))).as("x"))
      .select(col("x.w").as("w"), col("x.n").as("n"))
    val eligible = adj.groupBy("w").agg(count(lit(1)).as("deg"))
      .where(col("deg") <= maxDegree).select("w")
    val adjE = linkPredAdjSlot.persist(adj.join(eligible, Seq("w")))
    val degE = adjE.groupBy("n").agg(count(lit(1)).as("deg"))
    val pairs = adjE.select(col("w"), col("n").as("n1"))
      .join(adjE.select(col("w"), col("n").as("n2")), Seq("w"))
      .where(col("n1") < col("n2"))
      .groupBy(col("n1").as("a"), col("n2").as("b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(degE.select(col("n").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(degE.select(col("n").as("b"), col("deg").as("deg_b")), Seq("b"))
      .withColumn("jaccard_bp",
        expr("(10000 * n_common) div (deg_a + deg_b - n_common)"))
      .join(e0, Seq("a", "b"), "left_anti")
      .select("a", "b", "n_common", "deg_a", "deg_b", "jaccard_bp")
      .orderBy(col("jaccard_bp").desc, col("a").asc, col("b").asc)
      .limit(topK)
  }

  /** HITS hubs & authorities (Kleinberg 1999): over a DIRECTED graph,
    * a good authority is pointed to by good hubs and a good hub points
    * to good authorities — the mutual-reinforcement pair PageRank
    * collapses into one score. The classic use here is link-graph
    * curation where direction matters: directories/aggregators (hubs)
    * vs canonical content (authorities).
    *
    * Determinism: scores are fixed-point micro-units in a LONG. Each
    * half-round is an integer sum over in/out-neighbors followed by
    * L∞ normalization — `raw · 1e6 div max(raw)` — instead of the
    * textbook L2 norm: long floor division is exact in any engine,
    * while an L2 norm's sqrt-then-divide drifts by ulps across libms.
    * The max itself is ONE scalar-subquery aggregate per half-round
    * (order-immune), so the whole computation is a pure integer
    * function of the edge set, replayable bit-for-bit by the oracle's
    * unrolled rounds. Scores land in [0, 1e6], max-normalized (the
    * best hub/authority reads 1e6, not a probability mass).
    *
    * Scale shape: the [[pageRank]] CSR recipe twice per round — the
    * out-adjacency (src → dsts[]) propagates hub→authority, the
    * in-adjacency (dst → srcs[]) propagates authority→hub; both built
    * ONCE, cached in operator-owned [[CacheSlot]]s, hash-partitioned
    * by their groupBy. Per round: two shuffle_hash joins of nodes-sized
    * relations, two map-side-partial sums, two one-row maxes — each max
    * reads the half-round's CUT raw sums (nodes-sized), never a second
    * pass over the edge fan-out.
    * Round state is nodes-sized (node + two longs), [[CheckpointCut]]
    * like every iterative tier — reliable files on a cluster with a
    * checkpoint dir, executor-local blocks in local mode.
    *
    * Overflow bound: raw auth ≤ indeg·1e6, and the normalization
    * multiplies by 1e6 before dividing, so indeg (and outdeg) must stay
    * below ~9·10⁶ — beyond that, scale the 1e6 unit down (same knob as
    * pageRank's `unitFp` note).
    *
    * @param iterations full hub→auth→hub rounds (fixed count — the
    *                   oracle unrolls them)
    * @return (node, hub_fp, auth_fp) in micro-units, L∞-normalized
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val adjOut = hitsOutSlot.persist(
      groupedAdjacency(e, "src", "dst", "dsts", useSet = false, withCount = false))
    val adjIn = hitsInSlot.persist(
      groupedAdjacency(e, "dst", "src", "srcs", useSet = false, withCount = false))
    val nodes = hitsNodeSlot.persist(
      adjOut.select(col("src").as("node"))
        .union(adjOut.select(explode(col("dsts")).as("node"))).distinct())

    // L∞ normalization: the round max is ONE one-row aggregate, crossed
    // in as a scalar (the established one-row-cross shape) so the
    // division stays a LONG `div` — floor-exact, never a double. The
    // greatest(·,1) guard only fires on an edgeless graph; nodes with no
    // contribution score 0.
    // ONE cut per half-round, on the RAW sums (the half-round's dominant
    // join+explode+sum term): the max's broadcast subplan and the
    // normalize join otherwise each run it in full — ReuseExchange does
    // not bridge the broadcast subtree under AQE (measured: duplicate
    // 326k-row partial-sum stages per half-round at sf0.1, a full extra
    // edge pass at scale). The normalized state itself stays LAZY — it is
    // a cheap join of the cached node set with the cut leaf plus a
    // broadcast scalar, consumed exactly once by the next half-round (and
    // once more by the final output join), so materializing it too was a
    // second nodes-sized checkpoint per half-round of pure overhead (the
    // r10 verdict's item 1: 4 cuts/round → 2).
    def normalized(raw: DataFrame, outCol: String): (DataFrame, DataFrame) = {
      val rawCut = CheckpointCut.cut(raw)
      val mx = rawCut.agg(greatest(coalesce(max(col("m")), lit(1L)), lit(1L)).as("mx"))
      val out = nodes.join(rawCut, Seq("node"), "left").crossJoin(broadcast(mx))
        .select(col("node"),
          expr("(coalesce(m, 0L) * 1000000L) div mx").as(outCol))
      (out, rawCut)
    }

    var hubs = nodes.withColumn("hub_fp", lit(1000000L))
    var hubsCut: DataFrame = null
    var auths: DataFrame = null
    for (i <- 1 to iterations) {
      // authority half-round: every edge ships its source's hub score
      val aRaw = adjOut.join(hubs.hint("shuffle_hash"), adjOut("src") === hubs("node"))
        .select(explode(col("dsts")).as("node"), col("hub_fp").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      val (a, aCut) = normalized(aRaw, "auth_fp")
      // the previous round's hub cut is fully folded into aCut (the lazy
      // hub state's only consumer) — release it now aCut is materialized
      if (hubsCut != null) CheckpointCut.release(hubsCut)
      // FINAL round: auths has TWO consumers (the hub half-round and the
      // returned join) — materialize it once instead of evaluating the
      // normalize join + max twice; every other round state stays lazy
      // (single consumer)
      auths = if (i == iterations) {
        val c = CheckpointCut.cut(a); CheckpointCut.release(aCut); c
      } else a
      // hub half-round: every edge ships its destination's FRESH
      // authority score back (the in-adjacency direction)
      val hRaw = adjIn.join(auths.hint("shuffle_hash"), adjIn("dst") === auths("node"))
        .select(explode(col("srcs")).as("node"), col("auth_fp").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      val (h, hCut) = normalized(hRaw, "hub_fp")
      // this round's auth cut is consumed by hCut — releasable except in
      // the FINAL round, where the returned join still reads it
      if (i < iterations) CheckpointCut.release(aCut)
      hubs = h
      hubsCut = hCut
    }
    // the final round's cut states back the returned plan — NOT released
    // here (the caller's action consumes them; same contract as pageRank)
    hubs.join(auths, Seq("node")).select("node", "hub_fp", "auth_fp")
  }

  /** k-core decomposition membership: the maximal subgraph in which
    * every node keeps degree ≥ k — the standard dense-community /
    * spam-farm / influential-subgraph extractor (Seidman 1983), and the
    * graph-side analogue of the corpus quality gates: peel the sparse
    * fringe, keep the load-bearing core.
    *
    * Semantics: SIMULTANEOUS peeling — each round recomputes degrees
    * over the surviving edge set and drops every node below k at once.
    * That makes the result order-independent (unlike sequential
    * peeling) and a pure function of (edges, k): the fixed point is
    * the k-core, and because converged rounds are no-ops, the bounded
    * `rounds` result equals the true core whenever `rounds` covers the
    * peeling depth — the oracle unrolls the same rounds and agrees
    * even short of convergence. The early exit ships ONE long per
    * round (the surviving-edge count), never data.
    *
    * Scale shape per round: one unionAll+groupBy degree aggregate
    * (map-side partial) and two left_semi joins filtering the edge
    * relation — all key-partitioned, nothing driver-side. Round state
    * is the surviving EDGE set, [[CheckpointCut]] so round r never
    * replays rounds 1..r-1 and dies reliably-recoverable on a cluster
    * with a checkpoint dir. Peeling depth, not graph size, is the
    * round axis (web graphs: tens of rounds strip the fringe).
    *
    * @param k      minimum degree kept (≥ 1)
    * @param rounds peel-round bound (also the oracle's unroll count)
    * @return (node, deg) — members of the surviving subgraph with
    *         their within-subgraph degree
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    var e = CheckpointCut.cut(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    var n = e.count()
    var done = n == 0L
    var r = 0
    while (!done && r < rounds) {
      r += 1
      val keep = degrees(e).where(col("deg") >= k).select("node")
      val prev = e
      e = CheckpointCut.cut(e
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .select("a", "b"))
      val n2 = e.count()
      CheckpointCut.release(prev)
      done = n2 == n || n2 == 0L
      n = n2
    }
    // the surviving edge set's cut state backs the returned degree plan
    // — not released here (the caller's action consumes it)
    degrees(e)
  }

  /** Item-item collaborative filtering scores over the co-occurrence
    * graph: cosine similarity `n_shared / √(deg_a·deg_b)` between
    * items sharing raters/buyers/readers, top-k neighbors per item —
    * the classic ItemCF / "customers also bought" primitive (Sarwar
    * 2001), and the graph-side complement of the dense ([[graft.ops.Similarity]])
    * and lexical (v11) retrieval tiers.
    *
    * Determinism: n_shared and degrees are exact integers from
    * [[coOccurrenceEdges]]' inverted-index join; the score's only
    * floating ops are one sqrt and one divide — both CORRECTLY
    * ROUNDED by IEEE-754 spec in every engine (the sparse-cosine
    * argument) — rounded to 6dp at the boundary; ranking ties break
    * on the neighbor id.
    *
    * Scale shape: the pair relation is the guarded co-occurrence join
    * (hub items droppable via `maxItemEntities` — the quadratic
    * blow-up guard); degrees are one DISTINCT-pair aggregate joined
    * back; the per-item top-k rides the bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]), so only k rows per item cross the
    * final exchange — never a window sort over all pairs.
    *
    * @return (item, neighbor, cosine, rank), both directions of every
    *         pair (a neighbor list per item; integral item ids — the
    *         heap is the long-id tier, same contract as v1)
    */
  def itemCf(
      rel: DataFrame,
      entityCol: String,
      itemCol: String,
      k: Int,
      minShared: Long = 2L,
      maxItemEntities: Long = Long.MaxValue): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // role swap into coOccurrenceEdges' vocabulary: ItemCF pairs ITEMS
    // sharing entities, so items are its "entities" and the shared
    // users its "items" — the hub guard then drops bought-everything
    // power users, exactly the ItemCF blow-up case
    val pairs = coOccurrenceEdges(rel, itemCol, entityCol, minShared, maxItemEntities)
    val deg = rel.select(col(entityCol).as("e"), col(itemCol).as("i")).distinct()
      .groupBy("i").agg(count(lit(1)).as("deg"))
    // both directions via explode (the g1 recipe — union would run the
    // co-occurrence join twice)
    val directed = pairs.select(explode(array(
        struct(col("src").as("item"), col("dst").as("neighbor"), col("n_shared")),
        struct(col("dst").as("item"), col("src").as("neighbor"), col("n_shared")))).as("x"))
      .select("x.item", "x.neighbor", "x.n_shared")
    val scored = directed
      .join(deg.select(col("i").as("item"), col("deg").as("deg_a")), Seq("item"))
      .join(deg.select(col("i").as("neighbor"), col("deg").as("deg_b")), Seq("neighbor"))
      .withColumn("cosine", round(
        col("n_shared").cast("double") /
          sqrt(col("deg_a").cast("double") * col("deg_b").cast("double")), 6))
    scored.groupBy("item")
      .agg(graft.functions.TopKAgg
        .top_k_by_score(col("cosine"), col("neighbor").cast("long"), k).as("tk"))
      .select(col("item"), posexplode(col("tk")))
      .select(col("item"), col("col.neighbor_id").as("neighbor"),
        col("col.cosine").as("cosine"), (col("pos") + 1).as("rank"))
  }

  /** Association rules (Agrawal & Srikant 1994, the pairwise tier) —
    * support / confidence / lift for item pairs co-occurring in
    * transactions: the "frequently bought together, and is it actually
    * correlated" query. Lift is the part a raw co-count can't tell
    * you: `P(a∧b)/(P(a)·P(b))` > 1 means the pair co-occurs MORE than
    * its items' popularities predict (a lift ~1 "rule" between two
    * bestsellers is noise — the classic market-basket trap).
    *
    * Determinism: all three ratios are floored integer divisions —
    * support/confidence in basis points, lift in micro-units computed
    * through decimal(38,0) intermediates (`1e6·n_ab·n_tx` overflows a
    * LONG once counts pass ~10⁶·10⁶; the wide decimal keeps the
    * product exact at any warehouse scale before the single floor).
    *
    * Scale shape: the pair join is [[coOccurrenceEdges]] (inverted
    * index over transactions, never all-pairs), with `maxTxItems`
    * dropping degenerate giant baskets before the quadratic
    * within-basket pairing; degrees and the transaction count are two
    * aggregates of the deduplicated relation. Rules ship for both
    * directions of each surviving pair (confidence is asymmetric).
    *
    * @return (antecedent, consequent, n_ab, support_bp, confidence_bp,
    *         lift_fp)
    */
  def associationRules(
      rel: DataFrame,
      txCol: String,
      itemCol: String,
      minShared: Long = 2L,
      maxTxItems: Long = Long.MaxValue): DataFrame = {
    // role swap into coOccurrenceEdges' vocabulary (the itemCf recipe):
    // rule items are its "entities", transactions its "items" — the hub
    // guard then bounds basket size, the within-tx pairing blow-up
    val pairs = coOccurrenceEdges(rel, itemCol, txCol, minShared, maxTxItems)
    val r = rel.select(col(txCol).as("t"), col(itemCol).as("i")).distinct()
    val deg = r.groupBy("i").agg(count(lit(1)).as("deg"))
    val nTx = r.agg(countDistinct(col("t")).as("n_tx"))
    pairs.select(explode(array(
        struct(col("src").as("antecedent"), col("dst").as("consequent"),
          col("n_shared").as("n_ab")),
        struct(col("dst").as("antecedent"), col("src").as("consequent"),
          col("n_shared").as("n_ab")))).as("x"))
      .select("x.antecedent", "x.consequent", "x.n_ab")
      .join(deg.select(col("i").as("antecedent"), col("deg").as("deg_a")),
        Seq("antecedent"))
      .join(deg.select(col("i").as("consequent"), col("deg").as("deg_b")),
        Seq("consequent"))
      .crossJoin(broadcast(nTx))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        expr("(10000L * n_ab) div n_tx").as("support_bp"),
        expr("(10000L * n_ab) div deg_a").as("confidence_bp"),
        expr("cast((cast(1000000 as decimal(38,0)) * n_ab * n_tx) div " +
          "(cast(deg_a as decimal(38,0)) * deg_b) as bigint)").as("lift_fp"))
  }

  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = e0.select(col("a").as("node")).unionAll(e0.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.select(col("node").as("a"), col("deg").as("dega")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("degb")), Seq("b"))
    val aFirst = (col("dega") < col("degb")) ||
      (col("dega") === col("degb") && col("a") < col("b"))
    val oriented = orientSlot.persist(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("degb")).otherwise(col("dega")).as("degv")))
    val o1 = oriented.select(col("u"), col("v").as("v1"), col("degv").as("d1"))
    val o2 = oriented.select(col("u"), col("v").as("v2"), col("degv").as("d2"))
    val wedges = o1.join(o2, Seq("u"))
      .where(col("d1") < col("d2") || (col("d1") === col("d2") && col("v1") < col("v2")))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    // nodes-sized result for the m^1.5 wedge pass it cost: the triangle
    // counts feed several per-node statistics (raw counts, clustering
    // coefficient) over the same graph in one session
    triSlot.persist(
      wedges.join(closing, Seq("v1", "v2"))
        .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_triangles")))
  }

  /** Newman–Girvan modularity of a community assignment — the quality
    * score for [[labelPropagation]]'s output (or any clustering of a
    * graph): how much denser are the communities than a degree-
    * preserving random rewiring? Q ∈ [−0.5, 1]; ~0 means the
    * "communities" are no better than chance, which is exactly the
    * check to run before trusting community labels from a 100 TB link
    * graph.
    *
    *   Q = Σ_c [ e_c/m − (d_c/2m)² ] = (4m·Σe_c − Σd_c²) / (4m²)
    *
    * with m undirected edges, e_c intra-community edges, and d_c the
    * community's total degree.
    *
    * Determinism: every term is an exact integer count; the single
    * quotient is reported in FLOORED micro-units via the positive-mod
    * subtraction (both engines' integer division truncates; a
    * divisible operand makes truncation floor — the olsTrend recipe;
    * the numerator IS negative whenever Q < 0, so this matters).
    * Arithmetic runs in decimal(38,0), exact past 10⁹ edges where the
    * long path would wrap (4m²·10⁶ at m = 10⁹ is ~4·10²⁴).
    *
    * Scale shape: two label joins on the edge list, one degree join,
    * then everything collapses to community grain and finally to three
    * one-row scalars crossed together. Unlabeled nodes (if any) drop
    * via the inner joins — the oracle must share that contract.
    *
    * @param edges  canonical undirected pair list (one row per edge)
    * @param labels (node, community) assignment
    * @return one row: (n_communities, m_edges, intra_edges,
    *         deg_sq_sum, modularity_micro) — deg_sq_sum as a LONG
    *         (exact to ~3·10⁹ total degree; the internal decimal math
    *         is exact far beyond)
    */
  /** Local clustering coefficient per node — the per-node density
    * signal [[triangleCounts]] feeds: of the `deg·(deg−1)/2` possible
    * links among a node's neighbors, what share exists?
    * `coeff_bp = (2·triangles·10⁴) div (deg·(deg−1))` — all integer,
    * floored bp. High-degree low-coefficient nodes are connectors
    * (or spam hubs); high-coefficient clusters are communities. Nodes
    * of degree < 2 have no defined coefficient and are omitted; nodes
    * in no triangle report 0.
    *
    * Scale shape: [[triangleCounts]]' degree-ordered plan (wedge volume
    * m^1.5, never Σdeg²) plus one degree aggregate and one left join —
    * the canonical edge list is slot-cached across both consumers via
    * [[cacheEdges]].
    *
    * @return (node, deg, n_triangles, coeff_bp)
    */
  def clusteringCoefficient(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = cacheEdges(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val deg = e0.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // pass the RAW edges, not e0: triangleCounts canonicalizes its input
    // itself, so the raw-input call produces the same canonicalized plans
    // as a standalone triangleCounts over this graph — its oriented and
    // result slots then hit across both consumers (an e0-input call
    // wraps a second canonicalization pass around the first, and the
    // double-wrapped plans never match anything). The cached e0 artifact
    // still serves the internal pass via CacheManager subplan
    // substitution.
    val tri = triangleCounts(edges, srcCol, dstCol)
    deg.where(col("deg") >= 2)
      .join(tri, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("coeff_bp", expr(
        """CAST((20000 * CAST(n_triangles AS DECIMAL(20,0)))
           div (CAST(deg AS DECIMAL(20,0)) * (deg - 1)) AS BIGINT)"""))
  }

  def modularity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      labels: DataFrame,
      nodeCol: String,
      communityCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val sym = e0.select(explode(array(
        struct(col("a").as("x")), struct(col("b").as("x")))).as("d"))
      .select(col("d.x").as("node"))
    val deg = sym.groupBy("node").agg(count(lit(1)).as("deg"))
    val comm = labels.select(col(nodeCol).as("node"),
      col(communityCol).as("community"))
    val mm = e0.agg(count(lit(1)).cast("decimal(38,0)").as("m"))
    val intra = e0
      .join(comm.select(col("node").as("a"), col("community").as("ca")), Seq("a"))
      .join(comm.select(col("node").as("b"), col("community").as("cb")), Seq("b"))
      .where(col("ca") === col("cb"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("intra"))
    val dc = deg.join(comm, Seq("node")).groupBy("community")
      .agg(sum(col("deg")).as("dsum"))
    val aggd = dc.agg(count(lit(1)).as("n_communities"),
      sum(col("dsum").cast("decimal(19,0)") * col("dsum").cast("decimal(19,0)"))
        .cast("decimal(38,0)").as("deg_sq"))
    mm.crossJoin(intra).crossJoin(aggd)
      .withColumn("num", expr(
        "CAST(1000000 AS DECIMAL(38,0)) * (4 * m * intra - deg_sq)"))
      .withColumn("den", expr("CAST(4 AS DECIMAL(38,0)) * m * m"))
      .select(col("n_communities"),
        col("m").cast("long").as("m_edges"),
        col("intra").cast("long").as("intra_edges"),
        col("deg_sq").cast("long").as("deg_sq_sum"),
        expr("""CASE WHEN m = 0 THEN CAST(NULL AS BIGINT)
                ELSE CAST((num - ((num % den + den) % den)) div den AS BIGINT)
                END""").as("modularity_micro"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the symmetrized edge list — the one-number
    * structural health check of a graph. Strongly negative means hubs
    * attach to leaves (crawl frontiers, spam link farms, bot/organic
    * mixing); near zero means degree-random wiring. At crawl scale this
    * is the cheap first question to ask of a 100 TB link graph before
    * paying for PageRank rounds.
    *
    * Computation: undirected edges are canonicalized and deduped (the
    * [[triangleCounts]] discipline), degrees come from one node
    * aggregate joined onto both endpoints, each edge contributes BOTH
    * orientations (Newman's symmetric sum — otherwise r depends on
    * which endpoint was stored as src), and the correlation rides
    * [[Stats.corrMatrix]]: exact decimal moment sums in one scan, the
    * shared closed-form IEEE tree ([[Stats.corrSql]]) at the end, so
    * the oracle reproduces the bits. Graph-shape scalars (nodes, max
    * degree) join in as one-row scalar crosses.
    *
    * Scale shape: two degree joins on the edge list (key-partitioned,
    * AQE-sized) and ONE map-side-partial moment aggregate; nothing is
    * ever materialized per node pair beyond the edges themselves.
    *
    * @return one row: (n_nodes, n_edges, n_endpoints, max_degree,
    *         assortativity) — assortativity NULL on degenerate
    *         (constant-degree) graphs, never a divide-by-zero NaN
    */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val sym = e0.select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("a").as("y")))).as("d"))
      .select("d.x", "d.y")
    val deg = sym.groupBy("x").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("x", "node")
    val pairs = sym
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
    val shape = deg.agg(
      count(lit(1)).as("n_nodes"), max(col("deg")).as("max_degree"))
    Stats.corrMatrix(pairs, Seq("dx" -> col("dx"), "dy" -> col("dy")))
      .crossJoin(shape)
      .select(col("n_nodes"), (col("n_rows") / 2).cast("long").as("n_edges"),
        col("n_rows").as("n_endpoints"), col("max_degree"),
        col("corr_dx_dy").as("assortativity"))
  }
}

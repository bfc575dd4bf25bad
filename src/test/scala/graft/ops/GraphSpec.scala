package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("a cycle is a fixed point: every node keeps exactly 1e6 micro-units") {
    // outdeg 1 everywhere -> each node receives exactly one full rank;
    // 150000 + 8500*1e6/10000 = 1e6 again, bit-exactly, every round
    val out = ranks(Seq("A" -> "B", "B" -> "C", "C" -> "A"), 5)
    assert(out == Map("A" -> 1000000L, "B" -> 1000000L, "C" -> 1000000L))
  }

  test("star graph: two hand-computed rounds, floor division and all") {
    val edges = Seq("C" -> "X1", "C" -> "X2", "C" -> "X3", "C" -> "X4",
      "X1" -> "C", "X2" -> "C", "X3" -> "C", "X4" -> "C")
    // r1: C = 150000 + 8500*4e6/10000 = 3550000
    //     Xi = 150000 + 8500*(1e6 div 4)/10000 = 362500
    val r1 = ranks(edges, 1)
    assert(r1("C") == 3550000L && r1("X1") == 362500L && r1("X4") == 362500L)
    // r2: C = 150000 + 8500*(4*362500)/10000 = 1382500
    //     Xi = 150000 + (8500*(3550000 div 4)) div 10000 = 904375
    val r2 = ranks(edges, 2)
    assert(r2("C") == 1382500L && r2("X2") == 904375L)
  }

  test("dangling sink drops its mass; source with no in-edges gets the teleport base") {
    val out = ranks(Seq("A" -> "B"), 1)
    // A receives nothing -> base only; B receives A's full rank
    assert(out == Map("A" -> 150000L, "B" -> 1000000L))
    // next round B's mass vanishes (sink): both fall toward the base
    val out2 = ranks(Seq("A" -> "B"), 2)
    assert(out2("A") == 150000L && out2("B") == 277500L) // 150000 + 8500*150000/10000
  }

  test("node ids keep the caller's type: long ids in, long ids out") {
    val out = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("s", "d"), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("authority ordering: a node every other node links to outranks the periphery") {
    val spokes = (1 to 6).map(i => s"X$i" -> "HUB") ++ (1 to 6).map(i => "HUB" -> s"X$i")
    val out = ranks(spokes, 5)
    assert((1 to 6).forall(i => out("HUB") > out(s"X$i")))
  }

  private def tris(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangles: K4 has 4 triangles, every node in 3 of them") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val out = tris(k4)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: a path has none; triangle-free nodes are absent") {
    assert(tris(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    // one triangle + a pendant: pendant node absent, triangle nodes at 1
    val out = tris(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: duplicates, reversed edges, and self-loops normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 1L), (2L, 2L))
    assert(tris(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: hub skew — star rims close exactly their own triangles") {
    // hub 0 connected to 10 rims; rims (1,2) and (3,4) also connected:
    // exactly 2 triangles, each counted once despite the hub's degree
    val star = (1L to 10L).map(i => (0L, i))
    val out = tris(star ++ Seq((1L, 2L), (3L, 4L)))
    assert(out == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("coOccurrenceEdges: threshold and hub guard") {
    // entities 1,2 share items a,b; 2,3 share only c; item z is shared
    // by everyone (a stop item)
    val rel = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "c"), (3L, "c"),
      (1L, "z"), (2L, "z"), (3L, "z"),
      (1L, "a")) // duplicate row must not double-count
      .toDF("ent", "item")
    val e2 = Graph.coOccurrenceEdges(rel, "ent", "item", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e2 == Set((1L, 2L, 3L), (2L, 3L, 2L))) // z counts toward both pairs
    // hub guard: dropping items shared by >2 entities removes z
    val eg = Graph.coOccurrenceEdges(rel, "ent", "item", minShared = 2,
      maxItemEntities = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(eg == Set((1L, 2L, 2L)))
  }

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int): Map[Long, Long] = {
    // undirected: feed both orientations
    val e = (edges ++ edges.map(_.swap)).toDF("s", "d")
    Graph.bfsHops(e, "s", "d", seeds.toDF("seed"), "seed", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfsHops: path graph distances; depth bound truncates; unreached absent") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(hops(path, Seq(1L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // bound cuts the frontier: node 5 (4 hops away) is ABSENT, not capped
    assert(hops(path, Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // disconnected component never appears
    assert(!hops(path :+ (100L, 101L), Seq(1L), 10).contains(100L))
  }

  test("bfsHops: multi-seed takes the minimum; a shortcut beats the long way") {
    // 1-2-3-4-5 plus shortcut 1-5: node 5 is 1 hop, node 4 is 2 (via 5)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L))
    assert(hops(g, Seq(1L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    // seeds at both ends: distances fold to the nearer seed; a seeded
    // node already reached stays 0 (labels never downgrade)
    assert(hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), Seq(1L, 5L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("bfsHops: maxHops=0 labels exactly the seed set") {
    assert(hops(Seq((1L, 2L)), Seq(1L), 0) == Map(1L -> 0L))
  }

  private def lpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val e = (edges ++ edges.map(_.swap)).toDF("s", "d")
    Graph.labelPropagation(e, "s", "d", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("labelPropagation: two cliques joined by one bridge edge keep distinct communities") {
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val out = lpa(cliqueA ++ cliqueB :+ ((4L, 11L)), rounds = 4)
    // within each clique every node converges to the clique's min id
    assert((1L to 4L).map(out).toSet.size == 1, out)
    assert((11L to 14L).map(out).toSet.size == 1, out)
    assert(out(1L) != out(12L), out) // the bridge does not merge them
  }

  test("labelPropagation: tie votes pick the smallest label; star collapses to hub-adjacent min") {
    // a path 1-2-3: node 2 sees labels {1,3} tied -> picks 1
    val one = lpa(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(one(2L) == 1L, one)
    // round-1 leaves ends swapped (2's label); fixed rounds replay
    // deterministically rather than converging — that's the contract
    assert(one(1L) == 2L && one(3L) == 2L, one)
  }

  test("dangling redistribution: hand-computed rounds, mass conserved, default off unchanged") {
    def rr(iters: Int) =
      Graph.pageRank(Seq("A" -> "B").toDF("src", "dst"), "src", "dst",
        iterations = iters, redistributeDangling = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // round 1: B is the only sink, share = 1e6 div 2 = 500000
    //   A = 150000 + 8500*(0 + 500000) div 10000       = 575000
    //   B = 150000 + 8500*(1000000 + 500000) div 10000 = 1425000
    val r1 = rr(1)
    assert(r1 == Map("A" -> 575000L, "B" -> 1425000L))
    // round 2: share = 1425000 div 2 = 712500
    //   A = 150000 + 8500*712500 div 10000              = 755625
    //   B = 150000 + 8500*(575000 + 712500) div 10000   = 1244375
    val r2 = rr(2)
    assert(r2 == Map("A" -> 755625L, "B" -> 1244375L))
    // total mass is conserved under redistribution (the drop variant leaks it)
    assert(r1.values.sum == 2000000L && r2.values.sum == 2000000L)
    // flag off stays bit-compatible with the documented drop variant
    assert(ranks(Seq("A" -> "B"), 2) == Map("A" -> 150000L, "B" -> 277500L))
  }

  test("reliable checkpoints when a checkpoint dir is set; retired rounds release their files") {
    // the cluster path: with a checkpoint dir, every round's state is
    // checkpoint FILES (survives executor loss), and rounds 1..k-1 are
    // deleted as the loop advances — only the final state remains
    val dir = java.nio.file.Files.createTempDirectory("graph-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val out = Graph.pageRank(
        Seq("A" -> "B", "B" -> "C", "C" -> "A").toDF("src", "dst"),
        "src", "dst", iterations = 3)
      out.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          assert(l.rdd.getCheckpointFile.isDefined,
            "round state must be a RELIABLE checkpoint when a dir is configured")
        case other => fail(s"expected a checkpoint leaf, got ${other.getClass}")
      }
      val byNode = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // same integers as the localCheckpoint path (cycle fixed point)
      assert(byNode.values.forall(_ == 1000000L))
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .count(_.getFileName.toString.startsWith("rdd-"))
      assert(rddDirs == 1, s"leaked checkpoint dirs: $rddDirs")
      // BFS too: known/frontier states all release except the returned one
      val hops = Graph.bfsHops(Seq(1L -> 2L, 2L -> 3L).toDF("s", "d"), "s", "d",
        Seq(1L).toDF("seed"), "seed", maxHops = 3)
      assert(hops.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("labelPropagation: a node with no in-edges keeps its own label") {
    // directed feed: 1 -> 2 only (no symmetrization here)
    val out = Graph.labelPropagation(
      Seq((1L, 2L)).toDF("s", "d"), "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L, out) // never receives a vote
    assert(out(2L) == 1L, out)
  }

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.personalizedPageRank(edges.toDF("s", "d"), "s", "d",
      seeds.toDF("seed"), "seed", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("personalized pagerank: two hand-computed rounds on a 2-cycle, seed {A}") {
    // r0: A=1e6, B=0; outdeg 1 each
    // r1: A = 150000 + 0.85*0 = 150000 ; B = 0 + 0.85*1e6 = 850000
    val r1 = ppr(Seq(1L -> 2L, 2L -> 1L), Seq(1L), 1)
    assert(r1 == Map(1L -> 150000L, 2L -> 850000L))
    // r2: A = 150000 + 0.85*850000 = 872500 ; B = 0.85*150000 = 127500
    val r2 = ppr(Seq(1L -> 2L, 2L -> 1L), Seq(1L), 2)
    assert(r2 == Map(1L -> 872500L, 2L -> 127500L))
  }

  test("personalized pagerank: seed dominates, farthest node trails") {
    // chain 1<->2<->3<->4: at finite iteration counts the mass travels in
    // waves (pointwise hop-monotonicity does NOT hold round by round —
    // node 3 can transiently outrank node 2), but the endpoints are
    // stable: the seed holds the max, the farthest node the min
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    val out = ppr(chain, Seq(1L), 4)
    assert(out(1L) == out.values.max && out(4L) == out.values.min, out)
  }

  test("personalized pagerank: a seed absent from the graph contributes nothing") {
    val out = ppr(Seq(1L -> 2L, 2L -> 1L), Seq(99L), 2)
    assert(out == Map(1L -> 0L, 2L -> 0L)) // no teleport mass anywhere
  }

  private def sssp(
      edges: Seq[(Long, Long, Long)], seeds: Seq[Long], rounds: Int): Map[Long, Long] = {
    val e = edges.toDF("src", "dst", "w")
    val s = seeds.toDF("seed")
    Graph.ssspBellmanFord(e, "src", "dst", "w", s, "seed", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sssp: relaxation beats the direct edge (the Bellman–Ford case)") {
    // A=1 -> B=2 (w 5), A -> C=3 (w 10), B -> C (w 2): the 2-edge path
    // A->B->C costs 7, cheaper than the direct 10 — round 2 must relax it
    val e = Seq((1L, 2L, 5L), (1L, 3L, 10L), (2L, 3L, 2L))
    assert(sssp(e, Seq(1L), 1) == Map(1L -> 0L, 2L -> 5L, 3L -> 10L))
    assert(sssp(e, Seq(1L), 2) == Map(1L -> 0L, 2L -> 5L, 3L -> 7L))
  }

  test("sssp: maxRounds bounds the path LENGTH — a node 3 edges out is absent at 2 rounds") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val r2 = sssp(chain, Seq(1L), 2)
    assert(!r2.contains(4L))
    assert(sssp(chain, Seq(1L), 3)(4L) == 3L)
  }

  test("sssp: multi-seed takes the cheapest seed; seeds stay at 0 even on a cheap cycle") {
    // both endpoints seeded; middle node takes min(4, 2) from the nearer seed
    val e = Seq((1L, 2L, 4L), (3L, 2L, 2L), (2L, 1L, 0L))
    val out = sssp(e, Seq(1L, 3L), 3)
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 0L))
  }

  test("sssp: zero rounds returns exactly the deduplicated seed set") {
    val out = sssp(Seq((1L, 2L, 1L)), Seq(1L, 1L, 9L), 0)
    assert(out == Map(1L -> 0L, 9L -> 0L))
  }

  private def aa(edges: Seq[(Long, Long)], maxDeg: Long = Long.MaxValue) =
    Graph.adamicAdar(edges.toDF("s", "d"), "s", "d", maxDegree = maxDeg, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap

  test("adamic-adar: path endpoints score 1/ln(deg) of the shared center; adjacent pairs are excluded") {
    // path 1-2-3: pair (1,3) shares center 2 (deg 2); pairs (1,2)/(2,3)
    // are existing edges and must not be proposed
    val out = aa(Seq(1L -> 2L, 2L -> 3L))
    val w2 = Math.round(1e6 / Math.log(2.0))
    assert(out == Map((1L, 3L) -> ((1L, w2))))
  }

  test("adamic-adar: rare shared neighbors outweigh hub neighbors") {
    // pairs (1,2) share ONLY hub 9 (deg 4); pairs (3,4) share dedicated
    // center 8 (deg 2): 1/ln(2) > 1/ln(4)
    val out = aa(Seq(1L -> 9L, 2L -> 9L, 5L -> 9L, 6L -> 9L, 3L -> 8L, 4L -> 8L))
    assert(out((3L, 4L))._2 > out((1L, 2L))._2)
    assert(out((1L, 2L)) == ((1L, Math.round(1e6 / Math.log(4.0)))))
  }

  test("adamic-adar: maxDegree drops hub centers before the quadratic wedge fan-out") {
    val star = Seq(1L -> 9L, 2L -> 9L, 3L -> 9L) // center 9 has deg 3
    assert(aa(star, maxDeg = 2).isEmpty)
    assert(aa(star).size == 3) // all three spoke pairs via the hub
  }

  private def jl(edges: Seq[(Long, Long)], maxDeg: Long = Long.MaxValue) =
    Graph.jaccardLinks(edges.toDF("s", "d"), "s", "d", maxDegree = maxDeg, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

  test("jaccardLinks: fully shared neighborhoods score 10000 bp; existing edges are excluded") {
    // square 1-2, 1-3, 4-2, 4-3: (1,4) share {2,3} = both full
    // neighborhoods; (2,3) share {1,4} likewise
    val out = jl(Seq(1L -> 2L, 1L -> 3L, 4L -> 2L, 4L -> 3L))
    assert(out == Map(
      (1L, 4L) -> ((2L, 2L, 2L, 10000L)),
      (2L, 3L) -> ((2L, 2L, 2L, 10000L))))
    // adding edge (2,3) removes that pair, and degrees shift with it:
    // (1,4) still shares {2,3} with deg 2 each → still 10000
    val out2 = jl(Seq(1L -> 2L, 1L -> 3L, 4L -> 2L, 4L -> 3L, 2L -> 3L))
    assert(!out2.contains((2L, 3L)))
    assert(out2((1L, 4L)) == ((2L, 2L, 2L, 10000L)))
  }

  test("jaccardLinks: partial overlap floors the bp; hub guard removes centers from BOTH counts") {
    // 1-{2,3}, 4-{3,5}: (1,4) share {3}; union = 2+2−1 = 3 → 3333 bp
    val out = jl(Seq(1L -> 2L, 1L -> 3L, 4L -> 3L, 4L -> 5L))
    assert(out((1L, 4L)) == ((1L, 2L, 2L, 3333L)))
    // the star's only wedge-capable center is hub 9 (deg 3): unguarded
    // it yields all three spoke pairs; maxDegree 2 removes it → nothing
    assert(jl(Seq(1L -> 9L, 2L -> 9L, 3L -> 9L)).size == 3)
    assert(jl(Seq(1L -> 9L, 2L -> 9L, 3L -> 9L), maxDeg = 2).isEmpty)
  }

  test("clusteringCoefficient: triangle nodes score 10000 bp, the bridged node 3333, " +
       "degree-1 pendants are omitted") {
    // triangle 1-2-3 plus pendant edge 3-4
    val out = Graph.clusteringCoefficient(
      Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((2L, 1L, 10000L)),
      2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 1L, 3333L))))
  }

  test("clusteringCoefficient: a star has zero coefficient at the hub (no triangles)") {
    val out = Graph.clusteringCoefficient(
      Seq(9L -> 1L, 9L -> 2L, 9L -> 3L).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(9L -> 0L)) // spokes are deg 1 → omitted
  }

  private def runHits(edges: Seq[(Long, Long)], iters: Int) =
    Graph.hits(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("hits: one hand-computed round — L-inf normalized integer scores") {
    // 1→3, 2→3, 2→4. Auth half: raw 3=2e6, 4=1e6, max 2e6 →
    // auth 3=1e6, 4=500000. Hub half: raw 1=auth(3)=1e6,
    // 2=auth(3)+auth(4)=1.5e6, max 1.5e6 → hub 1=666666, 2=1e6.
    val out = runHits(Seq(1L -> 3L, 2L -> 3L, 2L -> 4L), 1)
    assert(out(1L) == ((666666L, 0L)))
    assert(out(2L) == ((1000000L, 0L)))
    assert(out(3L) == ((0L, 1000000L)))
    assert(out(4L) == ((0L, 500000L)))
  }

  test("hits: pure sources have zero authority, pure sinks zero hub; self-loops dropped") {
    val out = runHits(Seq(1L -> 2L, 2L -> 2L), 2) // self-loop on 2 ignored
    assert(out(1L)._2 == 0L) // nothing points at 1
    assert(out(2L)._1 == 0L) // 2 points at nothing (after self-loop drop)
    assert(out(1L)._1 == 1000000L && out(2L)._2 == 1000000L)
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    Graph.kCore(edges.toDF("s", "d"), "s", "d", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("k-core: triangle survives a 2-core, tail is peeled; 3-core of a triangle is empty") {
    val tri = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L)
    assert(runKCore(tri, 2, 5) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(runKCore(tri, 3, 5).isEmpty)
  }

  test("itemCf: hand-computed cosine over shared buyers; both directions; minShared gates") {
    import spark.implicits._
    // buyers 1,2 both buy items 10 and 20; buyer 3 buys 20 and 30 →
    // only (10,20) shares ≥ 2 buyers. deg(10)=2, deg(20)=3 →
    // cos = 2/sqrt(6)
    val rel = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 20L), (3L, 30L)).toDF("u", "i")
    val out = Graph.itemCf(rel, "u", "i", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    val want = BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(
      (10L, 20L) -> ((want, 1)),
      (20L, 10L) -> ((want, 1))))
    // duplicate purchase rows must not inflate counts
    val dup = rel.union(rel)
    assert(Graph.itemCf(dup, "u", "i", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((10L, 20L), (20L, 10L)))
  }

  test("k-core: peeling cascades — a chain dissolves round by round, and bounded rounds stop mid-peel") {
    val chain = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(runKCore(chain, 2, 5).isEmpty) // full cascade
    // one round only: endpoints 1,5 peel; 2,3,4 remain with the
    // surviving middle edges (2,3),(3,4)
    assert(runKCore(chain, 2, 1) == Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  private def assort(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = Graph.assortativity(edges.toDF("s", "d"), "s", "d").collect().head
    ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
      Option(r.get(4)).map(_.asInstanceOf[Double]))
  }

  test("assortativity: a star is perfectly disassortative (r = −1)") {
    // center 0 (deg 3) to leaves (deg 1): every endpoint pair is
    // (3,1)/(1,3) → r = −1 exactly
    val (shape, r) = assort(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L))
    assert(shape == ((4L, 3L, 6L, 3L)))
    assert(r.contains(-1.0))
  }

  test("assortativity: P4 path hand-computed (r = −0.5); NULL on constant-degree graphs") {
    // degrees 1,2,2,1 → moments n=6, Σd=10, Σd²=18, Σdxdy=16 →
    // r = (96−100)/(108−100) = −0.5
    val (shape, r) = assort(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(shape == ((4L, 3L, 6L, 2L)))
    assert(r.contains(-0.5))
    // a triangle is degree-constant: zero variance → NULL, never NaN
    val (triShape, triR) = assort(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    assert(triShape == ((3L, 3L, 6L, 2L)))
    assert(triR.isEmpty)
  }

  test("assortativity: reversed and duplicate edges canonicalize; self-loops drop") {
    val (shape, r) = assort(Seq(0L -> 1L, 1L -> 0L, 0L -> 1L,
      0L -> 2L, 0L -> 3L, 2L -> 2L))
    assert(shape == ((4L, 3L, 6L, 3L)))
    assert(r.contains(-1.0))
  }

  private def modul(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = Graph.modularity(edges.toDF("s", "d"), "s", "d",
      labels.toDF("node", "community"), "node", "community").collect().head
    ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
      Option(r.get(4)).map(_.asInstanceOf[Long]))
  }

  test("modularity: two triangles with a bridge, hand-computed Q = 5/14 floored to micro-units") {
    // m=7, intra=6, every community degree 7 → Σd²=98:
    // Q = (4·7·6 − 98)/(4·49) = 70/196 = 0.357142857… → 357142 floored
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L)
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val (shape, q) = modul(edges, labels)
    assert(shape == ((2L, 7L, 6L, 98L)))
    assert(q.contains(357142L))
  }

  test("modularity: one community scores exactly 0; a split single edge scores −0.5 (negative floor)") {
    val (oneShape, oneQ) = modul(Seq(1L -> 2L, 2L -> 3L),
      Seq(1L -> 9L, 2L -> 9L, 3L -> 9L))
    assert(oneShape._1 == 1L && oneQ.contains(0L))
    // num = 1e6·(0 − 2) = −2e6, den = 4 → exactly −500000; an
    // unfloored truncation would be identical here, so also pin a
    // NON-divisible negative: labels split a path of 2 edges
    val (splitShape, splitQ) = modul(Seq(1L -> 2L), Seq(1L -> 1L, 2L -> 2L))
    assert(splitShape == ((2L, 1L, 0L, 2L)))
    assert(splitQ.contains(-500000L))
    // path 1-2-3 split {1,2},{3}: m=2, intra=1, d={3,1}, Σd²=10:
    // Q = (8−10)/16 = −0.125 → −125000 exactly; and {1},{2,3}:
    // same by symmetry. Non-divisible: m=3 path split unevenly:
    // edges 1-2,2-3,3-4, labels {1,2},{3},{4}: intra=1, d=(3,2,1)
    // Σd²=14, Q=(12−14)/36 = −1/18 = −0.0555… → floor −55556
    val (_, q3) = modul(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L),
      Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
    assert(q3.contains(-55556L))
  }

  test("closenessCentrality: path graph hand-computed; horizon cuts the far tail") {
    // path 1-2-3-4-5, seeds 1 and 3, horizon 3:
    //   seed 1 reaches {2,3,4} at d=1,2,3 (5 is 4 hops — outside):
    //     n=3, Σd=6, harmonic = 1e6 + 500000 + 333333 = 1833333,
    //     closeness = 3e6 div 6 = 500000
    //   seed 3 reaches {2,4}@1, {1,5}@2: n=4, Σd=6,
    //     harmonic = 2·1e6 + 2·500000 = 3000000, closeness = 4e6 div 6
    //     = 666666 (floored — truncation coincides on positives)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val e = (edges ++ edges.map(_.swap)).toDF("s", "d")
    val out = Graph.closenessCentrality(e, "s", "d",
        Seq(1L, 3L).toDF("seed"), "seed", maxHops = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out(1L) == ((3L, 6L, 1833333L, Some(500000L))))
    assert(out(3L) == ((4L, 6L, 3000000L, Some(666666L))))
  }

  test("associationRules: hand-computed support/confidence/lift; lift detects the popularity trap") {
    // 4 transactions: {a,b}, {a,b}, {a,c}, {a}
    //   deg a=4, b=2, c=1, n_tx=4; pair (a,b): n_ab=2
    //   support = 2/4 → 5000bp; conf a→b = 2/4 → 5000, b→a = 2/2 → 10000
    //   lift = 1e6·2·4 div (4·2) = 1000000 — exactly independent:
    //   b only ever appears with the bestseller a, lift says "no signal"
    val rel = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "a")).toDF("t", "i")
    val out = Graph.associationRules(rel, "t", "i", minShared = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("a", "b")) == ((2L, 5000L, 5000L, 1000000L)))
    assert(out(("b", "a")) == ((2L, 5000L, 10000L, 1000000L)))
    assert(!out.contains(("a", "c"))) // below minShared
  }

  test("associationRules: a genuinely correlated pair lifts above 1e6") {
    // {a,b}, {a,b}, {c}, {d}: deg a=b=2, n_tx=4, n_ab=2 →
    // lift = 1e6·2·4 div 4 = 2000000 (co-occur 2× their popularity)
    val rel = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "c"), (4L, "d")).toDF("t", "i")
    val out = Graph.associationRules(rel, "t", "i", minShared = 2L)
      .where(org.apache.spark.sql.functions.col("antecedent") === "a").head()
    assert(out.getLong(5) == 2000000L)
  }

  test("seededDistances: a 100-seed panel exercises the multi-word bitmask path exactly") {
    // 200-node undirected cycle, seeds 0..99 — two 64-bit mask words
    // (the MS-BFS frontier layout's word_idx > 0 branch, which the
    // 40-seed verified queries never reach). Expected set is closed
    // form: each seed reaches s±1 at hop 1 and s±2 at hop 2.
    val edges = (0L until 200L).map(i => i -> ((i + 1) % 200))
    val e = (edges ++ edges.map(_.swap)).toDF("s", "d")
    val out = Graph.seededDistances(e, "s", "d",
        (0L until 100L).toDF("seed"), "seed", maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = (0L until 100L).flatMap { s =>
      Seq((s, s, 0L),
        (s, (s + 1) % 200, 1L), (s, (s + 199) % 200, 1L),
        (s, (s + 2) % 200, 2L), (s, (s + 198) % 200, 2L))
    }.toSet
    assert(out == expected)
  }

  test("closenessCentrality: an isolated seed reports zeros and a NULL closeness, never a crash") {
    val e = Seq(1L -> 2L, 2L -> 1L).toDF("s", "d")
    val out = Graph.closenessCentrality(e, "s", "d",
      Seq(99L).toDF("seed"), "seed", maxHops = 2).head()
    assert((out.getLong(1), out.getLong(2), out.getLong(3), out.isNullAt(4)) ==
      ((0L, 0L, 0L, true)))
  }

  test("edgeChurn: canonicalized undirected sets — a reversed edge is retained, not churned") {
    val a = Seq(1L -> 2L, 2L -> 3L).toDF("s", "d")
    val b = Seq(2L -> 1L, 3L -> 4L).toDF("s", "d") // (2,1) ≡ (1,2)
    val r = Graph.edgeChurn(a, b, "s", "d").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((2L, 2L, 1L, 1L, 1L, 3333L)))
  }

  test("diameterDoubleSweep: a path graph reads its exact diameter; maxHops truncates honestly") {
    // path 1—2—3—4—5: seed = 1, farthest = 5 at ecc 4, sweep-2 from 5
    // spans the whole path → diameter 4, all 5 nodes reached
    val p = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val e = (p ++ p.map(_.swap)).toDF("s", "d")
    val out = Graph.diameterDoubleSweep(e, "s", "d", maxHops = 8).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getLong(4)) == ((1L, 5L, 4L, 4L, 5L)))
    // bounded at 2 hops: sweep 1 stops at node 3 (far = min id among
    // max-hop nodes), sweep 2 from 3 reaches everything within 2
    val cut = Graph.diameterDoubleSweep(e, "s", "d", maxHops = 2).head()
    assert((cut.getLong(0), cut.getLong(1), cut.getLong(2), cut.getLong(3),
      cut.getLong(4)) == ((1L, 3L, 2L, 2L, 5L)))
  }
}

package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ClusteringSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def assignMap(
      rows: Seq[(Long, Seq[Double])], k: Int, iters: Int): Map[Long, (Long, Double)] =
    Clustering.kmeansAssign(rows.toDF("id", "v"), "id", "v", k, iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("partition property: every id exactly once, cluster in 1..k, dist integral") {
    val rows = (1L to 40L).map(i => i -> Seq(i.toDouble / 7.0, (i % 5).toDouble))
    val out = assignMap(rows, k = 4, iters = 2)
    assert(out.keySet == (1L to 40L).toSet)
    assert(out.values.forall { case (c, d) =>
      c >= 1 && c <= 4 && d >= 0.0 && d == math.floor(d)
    })
  }

  test("k = n: every point is its own seed, so every distance is exactly zero") {
    val rows = (1L to 6L).map(i => i -> Seq(i * 1.1, -i * 0.3))
    val out = assignMap(rows, k = 6, iters = 0)
    assert(out.values.map(_._2).toSeq == Seq.fill(6)(0.0))
    assert(out.values.map(_._1).toSet == (1L to 6L).toSet) // distinct cells
  }

  test("identical points: argmin ties to the smallest cell id; empty cells survive") {
    // 5 identical vectors, k=3 -> three identical seeds (cids 1..3); every
    // point ties at dist 0 and must land in cell 1; cells 2 and 3 go empty
    // and keep their centroid (no shrink, no crash) through both rounds
    val rows = (1L to 5L).map(i => i -> Seq(2.5, -1.25))
    val out = assignMap(rows, k = 3, iters = 2)
    assert(out.values.forall(_ == (1L, 0.0)))
  }

  test("two separated groups with seeds in each: one Lloyd round, hand-checked") {
    // pick ids so that the two smallest md5(id) land one in each group —
    // computed with the same md5 the operator uses, not guessed
    val ids = (1L to 8L)
    val bySeed = ids.sortBy(i => (md5hex(i.toString), i.toString))
    val (seed1, seed2) = (bySeed(0), bySeed(1))
    // group A = seed1's side at x=0/0.001..., group B = seed2's at x=10
    val rows = ids.map { i =>
      val base = if (i == seed1 || (i != seed2 && i % 2 == 0)) 0.0 else 10.0
      i -> Seq(base + (i.toDouble / 1000.0)) // +i mm jitter, quantizes to +i
    }
    val out = assignMap(rows, k = 2, iters = 1)
    // quantized coords: group A members -> i (in fp units), group B -> 10000+i;
    // every A point is ~i-fp from seed1 and ~10000-fp from seed2 -> cell of
    // seed1; symmetric for B. After recenter the assignment is unchanged
    // (centroids move within their group), so clusters == group membership.
    val cellOfA = out(seed1)._1
    val cellOfB = out(seed2)._1
    assert(cellOfA != cellOfB)
    rows.foreach { case (i, v) =>
      val expected = if (v.head < 5.0) cellOfA else cellOfB
      assert(out(i)._1 == expected, s"id $i")
    }
    // dist_fp is the exact integer squared distance to the FLOOR-mean
    // centroid of its own group — recompute it here with integer math
    val qa = rows.filter(_._2.head < 5.0).map(r => math.round(r._2.head * 1000))
    val ca = math.floor(qa.sum.toDouble / qa.size).toLong
    val expectA = qa.map(q => (q - ca).toDouble * (q - ca)).toSeq
    val gotA = rows.filter(_._2.head < 5.0).map(r => out(r._1)._2).toSeq
    assert(gotA.sorted == expectA.sorted)
  }

  test("cluster-balanced sample: exactly nPer per cell when cells are big enough") {
    val rows = (1L to 60L).map(i => i -> Seq((i % 2).toDouble * 50.0, i.toDouble / 100.0))
    val out = Clustering.clusterBalancedSample(
      rows.toDF("id", "v"), "id", "v", k = 2, iters = 2, nPer = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byCell = out.groupBy(_._1)
    assert(byCell.size == 2 && byCell.values.forall(_.length == 5))
    assert(byCell.values.forall(_.map(_._3).sorted.toSeq == (1 to 5)))
    assert(out.map(_._2).distinct.length == out.length) // ids never repeat
  }

  test("margin gate: identical centroids give zero margins; separated cells positive ones") {
    // 5 identical points, k=2 -> both centroids equal -> every margin 0,
    // everything ties into cell 1
    val same = (1L to 5L).map(i => i -> Seq(3.0, 4.0))
    val z = Clustering.marginGate(same.toDF("id", "v"), "id", "v", k = 2, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(z.toSeq == Seq((1L, 5L, 0.0, 0.0, 0.0)))

    // two tight groups far apart: margins are large and integral, counts split
    val rows = (1L to 20L).map(i =>
      i -> Seq((i % 2).toDouble * 100.0 + i.toDouble / 1000.0))
    val out = Clustering.marginGate(rows.toDF("id", "v"), "id", "v", k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 2 && out.map(_._2).sum == 20)
    assert(out.forall { case (_, _, s, mn, mx) =>
      mn > 0.0 && mx >= mn && s >= mn && s == math.floor(s) &&
        mn == math.floor(mn) && mx == math.floor(mx)
    }, out.toSeq)
  }

  test("dbscan: core clique, border attaches, isolated point is noise") {
    // unit vectors on angles; neighbor iff cosine >= cos(10°). The
    // 5-clique at 0..8° is pairwise within 10° -> each has 4 neighbors
    // + self = minPts 5 -> all core, one cluster labeled by min id.
    // 14.5° reaches only 6° and 8° (2 neighbors < 4) -> border.
    // 90° reaches nobody -> noise.
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val rows = Seq(
      1L -> v(0), 2L -> v(2), 3L -> v(4), 4L -> v(6), 5L -> v(8),
      6L -> v(14.5), 7L -> v(90))
    val out = Clustering.dbscan(rows.toDF("id", "vec"), "id", "vec",
      threshold = math.cos(math.toRadians(10)), minPts = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (1L to 5L).foreach(i => assert(out(i) == ("core", 1L), s"id $i: ${out(i)}"))
    assert(out(6L) == ("border", 1L), out(6L))
    assert(out(7L) == ("noise", -1L), out(7L))
  }

  test("dbscan: two dense regions become two clusters; minPts gates density") {
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val a = Seq(1L -> v(0), 2L -> v(2), 3L -> v(4))       // clique A
    val b = Seq(10L -> v(180), 11L -> v(182), 12L -> v(184)) // clique B, opposite
    val out = Clustering.dbscan((a ++ b).toDF("id", "vec"), "id", "vec",
      threshold = math.cos(math.toRadians(10)), minPts = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out.values.forall(_._1 == "core"))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct == Seq(1L))
    assert(Seq(10L, 11L, 12L).map(out(_)._2).distinct == Seq(10L))
  }

  test("prototypeAccuracy: a traitor outvoted by its labelmates flips to the other prototype") {
    import spark.implicits._
    // four label-0 vectors at (2, 0) pin c0 = (1600, 2000) even with
    // the traitor at (0, 10); c1 = (0, 3000). Traitor distances:
    // d0 = 1600² + 8000² = 66.56e6 > d1 = 7000² = 49e6 → predicted 1 →
    // label 0 reads 4/5 = 8000 bp, label 1 stays perfect. (A traitor in
    // a SMALL label instead drags its own centroid after it and stays
    // "correct" — the prototype classifier's honest failure mode.)
    val emb = ((1L to 4L).map(i => (i, Seq(2.0f, 0.0f), 0)) ++ Seq(
      (5L, Seq(0.0f, 10.0f), 0),
      (6L, Seq(0.0f, 2.0f), 1), (7L, Seq(0.0f, 4.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Clustering.prototypeAccuracy(emb, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      0 -> ((5L, 4L, 8000L)),
      1 -> ((2L, 2L, 10000L))))
  }
}

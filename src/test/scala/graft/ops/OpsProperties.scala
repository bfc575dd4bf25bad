package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized equivalence checks for the distributed operators against
  * straight-line in-memory references — the property-test tier above the
  * hand-case specs (a hand case pins a known trap; the random runs sweep
  * the space between them). Each case uses a FIXED seed: failures
  * reproduce, and CI never flakes.
  */
class OpsPropertiesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("intervalCoverage equals the in-memory interval union on random inputs") {
    val rnd = new Random(41)
    for (_ <- 1 to 5) {
      val rows = Seq.fill(120) {
        val k = "k" + rnd.nextInt(4)
        val s = rnd.nextInt(200).toLong
        (k, s, s + 1 + rnd.nextInt(40))
      }
      // reference: per key, sort and sweep
      val expect = rows.groupBy(_._1).map { case (k, iv) =>
        val sorted = iv.map(x => (x._2, x._3)).sortBy(identity)
        var islands = List.empty[(Long, Long)]
        for ((s, e) <- sorted) islands match {
          case (is, ie) :: t if s <= ie => islands = (is, math.max(ie, e)) :: t
          case _ => islands = (s, e) :: islands
        }
        k -> (islands.size.toLong, islands.map(x => x._2 - x._1).sum,
          islands.map(_._2).max - islands.map(_._1).min)
      }
      val got = TimeSeries.intervalCoverage(rows.toDF("key", "s", "e"), "key", "s", "e")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expect)
    }
  }

  test("bfsHops equals in-memory BFS on random graphs") {
    val rnd = new Random(42)
    for (_ <- 1 to 5) {
      val n = 30
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val undirected = (edges ++ edges.map(_.swap)).distinct
      val seeds = Seq(0L, (n / 2).toLong)
      // reference BFS
      val adj = undirected.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      var d = 0L
      while (frontier.nonEmpty && d < 10) {
        d += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)).diff(dist.keySet)
        dist = dist ++ next.map(_ -> d)
        frontier = next
      }
      val got = Graph.bfsHops(undirected.toDF("s", "d"), "s", "d",
        seeds.toDF("seed"), "seed", 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist)
    }
  }

  test("labelPropagation equals the in-memory synchronous simulation on random graphs") {
    val rnd = new Random(43)
    for (_ <- 1 to 5) {
      val n = 25
      val base = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val undirected = (base ++ base.map(_.swap)).distinct
      val inNbrs = undirected.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val nodes = undirected.flatMap(e => Seq(e._1, e._2)).distinct
      var labels = nodes.map(v => v -> v).toMap
      for (_ <- 1 to 3) {
        labels = nodes.map { v =>
          val votes = inNbrs.getOrElse(v, Nil).map(labels)
          if (votes.isEmpty) v -> labels(v)
          else {
            val grouped = votes.groupBy(identity).view.mapValues(_.size)
            v -> grouped.toSeq.maxBy { case (l, c) => (c, -l) }._1
          }
        }.toMap
      }
      val got = Graph.labelPropagation(undirected.toDF("s", "d"), "s", "d", 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == labels)
    }
  }

  test("hammingNearDupPairs equals brute force on random 64-bit signatures") {
    val rnd = new Random(44)
    for (_ <- 1 to 5) {
      // half the sigs are perturbations of a shared base so near pairs exist
      val base = rnd.nextLong()
      val sigs = (0 until 40).map { i =>
        val s = if (i % 2 == 0) rnd.nextLong()
          else base ^ (1L << rnd.nextInt(64)) ^ (1L << rnd.nextInt(64))
        (i.toLong, s)
      }
      val expect = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (ia, ib, h)).toSet
      val got = Dedup.hammingNearDupPairs(sigs.toDF("id", "sig"), "id", "sig", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expect)
    }
  }

  test("count_min never underestimates on random multisets; counters partition-invariant") {
    val rnd = new Random(45)
    graft.GraftExtensions.register(spark)
    for (_ <- 1 to 3) {
      val items = Seq.fill(800)(rnd.nextInt(60).toLong)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk1 = items.toDF("item").repartition(1)
        .agg(expr("count_min(item, 4, 32)")).collect().head.getSeq[Long](0)
      val sk7 = items.toDF("item").repartition(7)
        .agg(expr("count_min(item, 4, 32)")).collect().head.getSeq[Long](0)
      assert(sk1 == sk7)
      truth.foreach { case (v, c) =>
        val est = (0 until 4)
          .map(j => sk1(j * 32 + graft.functions.CountMin.bucket(j, v, 32))).min
        assert(est >= c, s"item $v: est $est < true $c")
      }
    }
  }
}

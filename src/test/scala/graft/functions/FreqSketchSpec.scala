package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class FreqSketchSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  graft.GraftExtensions.register(spark) // SQL surface (misra_gries)

  private def sketch(items: Seq[Long], k: Int, parts: Int): Map[Long, Long] =
    items.toDF("item").repartition(parts)
      .agg(expr(s"misra_gries(item, $k)").as("s"))
      .collect().head.getSeq[Row](0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("distinct items within k: counts are exact (no decrement ever fires)") {
    val items = Seq.fill(40)(7L) ++ Seq.fill(25)(8L) ++ Seq.fill(3)(9L)
    for (parts <- Seq(1, 3, 7)) {
      assert(sketch(items, 10, parts) == Map(7L -> 40L, 8L -> 25L, 9L -> 3L),
        s"parts=$parts")
    }
  }

  test("guarantee: every item above N/(k+1) is present, under any partitioning") {
    // 4 hot items at 1/8 of N each + a long unique tail (the x17 shape)
    val hot = (0 until 4).flatMap(h => Seq.fill(250)(h.toLong))
    val tail = (0 until 1000).map(i => 1000L + i)
    val items = hot ++ tail // N = 2000; threshold N/(k+1) with k=50 -> ~39
    for (parts <- Seq(1, 2, 5, 13)) {
      val s = sketch(items, 50, parts)
      (0 until 4).foreach(h =>
        assert(s.contains(h.toLong), s"hot item $h missing at parts=$parts: $s"))
    }
  }

  test("weights never overestimate the true count") {
    val items = (0 until 2000).map(i => (i % 37).toLong) // moderate collisions
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 4)) {
      sketch(items, 10, parts).foreach { case (item, w) =>
        assert(w <= truth(item), s"item $item overestimated: $w > ${truth(item)}")
      }
    }
  }

  test("presentation order is (weight DESC, item ASC); nulls are skipped") {
    val df = Seq(Some(1L), Some(1L), Some(2L), Some(2L), Some(3L), None)
      .toDF("item")
    val arr = df.agg(expr("misra_gries(item, 10)").as("s"))
      .collect().head.getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1)))
    assert(arr == Seq((1L, 2L), (2L, 2L), (3L, 1L)), arr)
  }

  test("grouped usage: one independent summary per group") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "item")
    val out = df.groupBy("g").agg(expr("misra_gries(item, 4)").as("s"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1)))).toMap
    assert(out("a") == Seq((1L, 2L), (2L, 1L)))
    assert(out("b") == Seq((9L, 1L)))
  }

  test("k must be a positive literal; item must be BIGINT") {
    val df = Seq(1L).toDF("item")
    intercept[Exception](df.agg(expr("misra_gries(item, 0)")).collect())
    intercept[Exception](df.agg(expr("misra_gries(item, item)")).collect())
    intercept[Exception](
      Seq("x").toDF("item").agg(expr("misra_gries(item, 5)")).collect())
  }

  test("integral items widen to BIGINT: INT columns sketch identically to their LONG cast") {
    // the usability contract: count_min(int_col, d, w) == count_min(cast(int_col as bigint), d, w)
    val ints = Seq(7, 7, 7, 8, 9, 7, 8).toDF("item")
    val viaInt = ints.agg(expr("count_min(item, 4, 64)")).collect().head.getSeq[Long](0)
    val viaLong = ints.select(col("item").cast("bigint").as("item"))
      .agg(expr("count_min(item, 4, 64)")).collect().head.getSeq[Long](0)
    assert(viaInt == viaLong)
    val mgInt = ints.agg(expr("misra_gries(item, 2)")).collect().head
      .getSeq[Row](0).map(x => (x.getLong(0), x.getLong(1)))
    assert(mgInt.head._1 == 7L) // the true heavy hitter survives
    // strings still rejected — no silent coercion into the hash domain
    intercept[Exception](
      Seq("x").toDF("item").agg(expr("count_min(item, 4, 64)")).collect())
  }

  // ------------------------------------------------------------------
  // count_min
  // ------------------------------------------------------------------

  private def cms(items: Seq[Long], depth: Int, width: Int, parts: Int): Seq[Long] =
    items.toDF("item").repartition(parts)
      .agg(expr(s"count_min(item, $depth, $width)").as("s"))
      .collect().head.getSeq[Long](0)

  private def estimate(counters: Seq[Long], item: Long, depth: Int, width: Int): Long =
    (0 until depth).map(j => counters(j * width + CountMin.bucket(j, item, width))).min

  test("count_min: counters are bit-identical under any partitioning (pure sums)") {
    val items = (0 until 2000).map(i => (i % 13).toLong) ++ (0 until 500).map(i => 100L + i)
    val ref = cms(items, 4, 64, 1)
    for (parts <- Seq(2, 5, 13))
      assert(cms(items, 4, 64, parts) == ref, s"parts=$parts")
    assert(ref.sum == 4L * items.size) // every row lands once per depth row
  }

  test("count_min: estimates never underestimate; exact without collisions") {
    val truth = Map(7L -> 40L, 8L -> 25L, 9L -> 3L, 12345L -> 7L)
    val items = truth.toSeq.flatMap { case (v, n) => Seq.fill(n.toInt)(v) }
    // narrow sketch: collisions likely, but never an underestimate
    val narrow = cms(items, 4, 4, 3)
    truth.foreach { case (v, n) =>
      assert(estimate(narrow, v, 4, 4) >= n, s"item $v underestimated")
    }
    // wide sketch over 4 items: md5 buckets are collision-free here
    // (deterministic — verifiable by enumerating the buckets), so every
    // estimate is exact and absent items estimate 0
    val wide = cms(items, 4, 4096, 3)
    val bucketsInjective = (0 until 4).exists { j =>
      truth.keys.map(CountMin.bucket(j, _, 4096)).toSet.size == truth.size
    }
    assert(bucketsInjective) // premise of the exactness claim
    truth.foreach { case (v, n) =>
      assert(estimate(wide, v, 4, 4096) == n, s"item $v inexact")
    }
    assert(estimate(wide, 999999L, 4, 4096) == 0L)
  }

  test("count_min: the SQL md5 recipe computes the internal bucket exactly") {
    // the warehouse-replayability contract: conv(substr(md5(j:item)))
    // in Spark SQL == CountMin.bucket — the same equality the DuckDB
    // oracle relies on with its '0x'||hex spelling
    val probe = Seq(0L, 7L, 1000005L, -3L, Long.MaxValue)
    val rows = probe.toDF("item")
      .select(col("item"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("b",
        expr("cast(conv(substr(md5(concat(j, ':', item)), 1, 8), 16, 10) as bigint) % 61"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == CountMin.bucket(r.getInt(1), r.getLong(0), 61),
        s"item=${r.getLong(0)} j=${r.getInt(1)}")
    }
  }

  test("count_min: depth/width must be positive literals; size cap enforced") {
    val df = Seq(1L).toDF("item")
    intercept[Exception](df.agg(expr("count_min(item, 0, 16)")).collect())
    intercept[Exception](df.agg(expr("count_min(item, 4, item)")).collect())
    intercept[Exception](df.agg(expr("count_min(item, 4096, 4096000)")).collect())
  }
}

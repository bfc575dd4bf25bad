package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("overlap join: hand-checked pairs, half-open semantics, empty intervals") {
    val a = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 5L))
      .toDF("a_id", "a_s", "a_e") // 3 is empty -> matches nothing
    val b = Seq((10L, 9L, 11L), (20L, 10L, 10L), (30L, 25L, 30L))
      .toDF("b_id", "b_s", "b_e") // 20 is empty; 30 overlaps nothing
    val out = RangeJoin.overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e", 4L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // [0,10) x [9,11) overlap at 9; [10,20) x [9,11) overlap at 10;
    // half-open: [0,10) does NOT meet [10,...)
    assert(out == Set((1L, 10L), (2L, 10L)), out)
  }

  test("overlap join equals the naive cross-join ground truth on random intervals") {
    // deterministic pseudo-random intervals (shared generator with
    // tools.StressRange); widths span 0 (empty) to ~6 buckets so pairs
    // cross many shared buckets and the first-overlap-bucket dedup is
    // genuinely exercised
    val a = tools.TestIntervals.intervals(spark, 400, 1, domain = 1000L, maxWidth = 60L)
    val b = tools.TestIntervals.intervals(spark, 300, 3, domain = 1000L, maxWidth = 60L)
    val fast = RangeJoin.overlapJoin(a, "s1", "e1", b, "s3", "e3", 10L)
      .select("id1", "id3")
    val naive = a.crossJoin(b)
      .where($"s1" < $"e3" && $"s3" < $"e1" && $"s1" < $"e1" && $"s3" < $"e3")
      .select("id1", "id3")
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0)
    assert(fast.count() == naive.count()) // exceptAll misses multiplicity-only drift
    assert(fast.count() > 100, "fixture produced too few overlaps to be meaningful")
  }

  test("the bucketed plan is an equi-join — no nested loop, no cartesian") {
    val a = spark.range(100).select($"id".as("a_id"), ($"id" * 10).as("a_s"), ($"id" * 10 + 15).as("a_e"))
    val b = spark.range(100).select($"id".as("b_id"), ($"id" * 7).as("b_s"), ($"id" * 7 + 9).as("b_e"))
    val p = RangeJoin.overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e", 16L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to all-pairs:\n$p")
  }
}

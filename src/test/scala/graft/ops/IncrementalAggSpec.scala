package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def state(rows: (String, Long, Long)*) =
    rows.toDF("k", "n_rows", "sum_v")
  private def delta(rows: (String, Long, Long)*) =
    rows.toDF("k", "op", "v")
  private def apply1(base: org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame) =
    IncrementalAgg.applyDelta(base, d, Seq("k"), "op", Seq("v" -> "sum_v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("applyDelta: inserts, deletes, a brand-new group, and an annihilated group") {
    val base = state(("a", 2L, 100L), ("b", 1L, 50L))
    // a: +1 row of 30; b: delete its only row; c: new group of 7
    val d = delta(("a", 1L, 30L), ("b", -1L, 50L), ("c", 1L, 7L))
    val out = apply1(base, d)
    assert(out == Map("a" -> ((3L, 130L)), "c" -> ((1L, 7L))))
  }

  test("applyDelta: delete adjusts the sum by the DELETED value, not the current state") {
    val out = apply1(state(("a", 3L, 600L)), delta(("a", -1L, 250L)))
    assert(out == Map("a" -> ((2L, 350L))))
  }

  test("applyDelta: a count going negative fails loudly, never persists a corrupt view") {
    val ex = intercept[Exception] {
      apply1(state(("a", 1L, 10L)), delta(("a", -1L, 10L), ("a", -1L, 10L)))
    }
    assert(ex.getMessage.contains("count went negative"))
  }

  test("applyDelta: agg(base ⊎ Δ) == agg(full) on a replayed partition of rows") {
    val all = Seq(("x", 1L), ("x", 2L), ("y", 3L), ("x", 4L), ("y", 5L), ("z", 6L))
    val (baseRows, insRows) = all.partition(_._2 % 2 == 0)
    val base = baseRows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
    val d = insRows.map { case (k, v) => (k, 1L, v) }.toDF("k", "op", "v")
    val direct = all.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(apply1(base, d) == direct)
  }
}

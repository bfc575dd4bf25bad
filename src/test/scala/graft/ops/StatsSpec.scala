package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def corr(rows: Seq[(Long, Long, Long)]) = {
    val df = rows.toDF("a", "b", "c")
    val out = Stats.corrMatrix(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"))).head()
    (out.getLong(0),
      Option(out.get(1)).map(_.asInstanceOf[Double]),
      Option(out.get(2)).map(_.asInstanceOf[Double]),
      Option(out.get(3)).map(_.asInstanceOf[Double]))
  }

  test("corrMatrix: perfect linear relations score ±1; the mixed pair matches the hand value") {
    // b = 2a (corr 1), c = -a (corr -1), so corr(b, c) = -1
    val (n, ab, ac, bc) = corr(Seq((1L, 2L, -1L), (2L, 4L, -2L), (3L, 6L, -3L)))
    assert(n == 3L)
    assert(ab.contains(1.0) && ac.contains(-1.0) && bc.contains(-1.0))
  }

  test("corrMatrix: a known non-trivial correlation to 6dp") {
    // a=(1,2,3), b=(1,3,2): n·sab − sa·sb = 3·13 − 6·6 = 3;
    // var terms both 3·14 − 36 = 6 → corr = 3/6 = 0.5
    val (_, ab, _, _) = corr(Seq((1L, 1L, 0L), (2L, 3L, 1L), (3L, 2L, 0L)))
    assert(ab.contains(0.5))
  }

  test("corrMatrix: a constant column yields NULL, never NaN or a divide error") {
    val (_, ab, ac, bc) = corr(Seq((1L, 7L, 1L), (2L, 7L, 2L), (3L, 7L, 3L)))
    assert(ab.isEmpty && bc.isEmpty) // b is constant
    assert(ac.contains(1.0))
  }

  test("corrMatrix: one scan — a single aggregate job, not a job per pair") {
    val sc = spark.sparkContext
    val df = Seq((1L, 2L, 3L), (4L, 5L, 6L)).toDF("a", "b", "c")
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Stats.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))).collect()
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 2, s"expected one aggregate job (+possible AQE), got ${after - before}")
  }
}

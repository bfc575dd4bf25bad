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

  private def outliers(k: Int, rows: (String, Double)*) = {
    import spark.implicits._
    Stats.robustOutliers(rows.toSeq.toDF("k", "value"), "k", "value", k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("robustOutliers: hand-computed median/MAD; one huge value cannot move either") {
    // 1,2,3,4,100 → median 3.00 (rank ⌈5/2⌉=3), deviations
    // 0,100,100,200,9700 → MAD 1.00; only 97.00 exceeds 3·MAD
    val out = outliers(3, ("a", 1.00), ("a", 2.00), ("a", 3.00),
      ("a", 4.00), ("a", 100.00))
    assert(out("a") == ((5L, 300L, 100L, 1L, 2000L)))
  }

  test("robustOutliers: MAD = 0 when over half the values coincide — every other value flags (Hampel)") {
    val out = outliers(3, ("a", 5.00), ("a", 5.00), ("a", 5.00), ("a", 9.00))
    assert(out("a") == ((4L, 500L, 0L, 1L, 2500L)))
  }

  test("benfordDeviation: string-exact digits, zero-count digits carry full expected mass, refunds by magnitude") {
    import spark.implicits._
    // cents: 100, 1999, -200, 5 → digits 1,1,2,5 (refund by |·|); n=4
    val df = Seq(("a", 1.00), ("a", 19.99), ("a", -2.00), ("a", 0.05),
      ("a", 0.00)).toDF("k", "value") // the 0.00 row must drop
    val out = Stats.benfordDeviation(df, "k", "value")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out.size == 9)
    assert(out(("a", 1)) == ((4L, 2L, 500000L, 301030L, 198970L)))
    assert(out(("a", 2)) == ((4L, 1L, 250000L, 176091L, 73909L)))
    assert(out(("a", 5)) == ((4L, 1L, 250000L, 79181L, 170819L)))
    // digit 9 never observed → obs 0, deviation = expected mass
    assert(out(("a", 9)) == ((4L, 0L, 0L, 45757L, 45757L)))
  }

  test("robustOutliers: duplicate-heavy histogram ranks — ties are rank-interchangeable") {
    // 1,1,1,2,2 → n=5, r=3 falls inside value 1's [1,3] range → median
    // 1.00; deviations 0(×3),100(×2) → MAD 0; both 2.00s flag at k=3
    val out = outliers(3, ("a", 1.00), ("a", 1.00), ("a", 1.00),
      ("a", 2.00), ("a", 2.00))
    assert(out("a") == ((5L, 100L, 0L, 2L, 4000L)))
  }
}

package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("profile: null handling, distincts, type-aware bound formatting") {
    val df = Seq(
      (Some(1L), Option("a"), Some(1.5)),
      (Some(2L), Option.empty[String], Some(2.25)),
      (Option.empty[Long], Option("b"), Option.empty[Double])
    ).toDF("id", "s", "d")
    val out = Profiling.profile(df, Seq("id", "s", "d"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_non_null"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_val"),
          r.getAs[String]("max_val")))).toMap
    assert(out("id") == ((3L, 2L, 2L, "1", "2")), out("id"))
    assert(out("s") == ((3L, 2L, 2L, "a", "b")), out("s"))
    // doubles format through DECIMAL(18,2) — fixed scale, engine-portable
    assert(out("d") == ((3L, 2L, 2L, "1.50", "2.25")), out("d"))
  }

  test("profile: approx mode swaps HLL++ in and stays within its error") {
    val df = spark.range(0, 10000).selectExpr("id", "id % 100 as k")
    val nd = Profiling.profile(df, Seq("k"), exact = false)
      .head().getAs[Long]("n_distinct")
    assert(math.abs(nd - 100L) <= 10, nd)
  }

  test("histogram: floor bins (negatives bin DOWN), bounds, exact totals") {
    val df = Seq(-120.0, -1.0, 0.0, 49.0, 50.0, 120.0).toDF("v")
    val out = Profiling.histogram(df, "v", 50L)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("bin_lo"), r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    // -120/50 = -2.4 → floor -3 (a truncating cast would give -2)
    assert(out(-3L) == ((-150L, 1L, -120.0)), out(-3L))
    assert(out(-1L) == ((-50L, 1L, -1.0)), out(-1L))
    assert(out(0L) == ((0L, 2L, 49.0)), out(0L))
    assert(out(1L) == ((50L, 1L, 50.0)), out(1L))
    assert(out(2L) == ((100L, 1L, 120.0)), out(2L))
  }

  test("histogram: nulls are excluded, not a null bin") {
    val df = Seq(Some(10.0), None, Some(60.0)).toDF("v")
    val bins = Profiling.histogram(df, "v", 50L).collect().map(_.getAs[Long]("bin")).toSet
    assert(bins == Set(0L, 1L))
  }
}

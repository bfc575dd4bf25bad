package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val large = (Seq.fill(500)(("hot", 1)) ++ Seq(("a", 2), ("b", 3)))
    .toDF("k", "v")
  private val small = Seq(("hot", 10), ("a", 20), ("b", 30), ("c", 40)).toDF("k", "w")

  test("salted join result equals plain join") {
    val plain = large.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", buckets = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("hot-key hybrid join equals plain join") {
    val plain = large.join(small, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n")).collect().map(_.toSeq).toSet
    val hybrid = Skew.saltedJoinHotKeys(large, small, "k", Seq("hot"), buckets = 8)
      .groupBy("k").agg(count(lit(1)).as("n")).collect().map(_.toSeq).toSet
    assert(hybrid == plain)
  }

  test("salt column does not leak into output") {
    val out = Skew.saltedJoin(large, small, "k", 4)
    assert(!out.columns.contains("_salt"))
  }

  test("keySkewProfile: hand-computed shares and uniform multiples; nulls excluded") {
    // 10 rows over 4 non-null keys: a×6, b×2, c×1, d×1 (+1 null row,
    // out): total 10, n_keys 4 → a: 6000bp, skew_x (6·4)div10 = 2
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .map(Option(_)).appended(None).toDF("k")
    val out = Skew.keySkewProfile(df, "k", topN = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1, "a", 6L, 6000L, 6000L, 2L),
      (2, "b", 2L, 2000L, 8000L, 0L),
      (3, "c", 1L, 1000L, 9000L, 0L)))
  }
}

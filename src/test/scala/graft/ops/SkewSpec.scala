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
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSumSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("grouped vector sum equals the posexplode formulation across partitions") {
    val df = spark.range(0, 1000).select(
      ($"id" % 5).as("g"),
      expr("transform(sequence(0, 7), d -> cast(sin(id * 8 + d) as double))").as("v"))
      .repartition(7)
      .cache()
    val viaAgg = df.groupBy("g")
      .agg(VectorSum.vector_sum($"v").as("s"))
      .select($"g", posexplode($"s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaExplode = df
      .select($"g", posexplode($"v"))
      .groupBy("g", "pos").agg(sum($"col").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    for ((k, v) <- viaAgg)
      assert(math.abs(v - viaExplode(k)) < 1e-9, s"dim $k: $v vs ${viaExplode(k)}")
    df.unpersist()
  }

  test("float input sums in double; null vectors are skipped") {
    val df = Seq(
      (0L, Some(Seq(1.0f, 2.0f))),
      (0L, None),
      (0L, Some(Seq(3.0f, 4.0f)))).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorSum.vector_sum($"v").as("s"))
      .collect().head.getSeq[Double](1)
    assert(out == Seq(4.0, 6.0))
  }

  test("all-null group yields an empty array, not a crash") {
    val df = Seq((0L, Option.empty[Seq[Double]])).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorSum.vector_sum($"v").as("s"))
      .collect().head.getSeq[Double](1)
    assert(out.isEmpty)
  }

  test("mixed dimensions in one group fail loudly") {
    val df = Seq((0L, Seq(1.0, 2.0)), (0L, Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VectorSum.vector_sum($"v")).collect()
    }
    assert(e.getMessage != null)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap partial top-k aggregate must be bit-for-bit
  * equivalent to the `row_number()` window formulation it replaces —
  * including tie-breaks — while never shuffling the scored-pair set.
  */
class TopKAggSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAgg.top_k_by_score($"score", $"id", k).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"col.neighbor_id".as("id"), $"col.cosine".as("score"),
        ($"pos" + 1).as("rank"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).where($"rank" <= k)
      .select($"g", $"id", $"score", $"rank")
  }

  test("equals the window formulation on random data, across many partitions") {
    // deterministic pseudo-random scores with deliberate collisions
    // (score quantized to 1000 levels over 5000 rows → ties guaranteed)
    val df = spark.range(0, 5000).select(
      ($"id" % 7).as("g"),
      $"id".as("id"),
      (floor(sin($"id") * 500) / lit(500.0)).as("score"))
      .repartition(13) // force many partial buffers per group
      .cache()
    for (k <- Seq(1, 5, 100)) {
      val a = viaAgg(df, k).collect().map(_.toSeq).toSet
      val w = viaWindow(df, k).collect().map(_.toSeq).toSet
      assert(a == w, s"agg/window divergence at k=$k")
    }
    df.unpersist()
  }

  test("ties break by ascending id, exactly like the window order") {
    val df = Seq((0L, 10L, 1.0), (0L, 3L, 1.0), (0L, 7L, 1.0), (0L, 1L, 0.5))
      .toDF("g", "id", "score").repartition(3)
    val rows = viaAgg(df, 2).orderBy("rank").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(3L, 7L)) // id asc among ties
    assert(rows.map(_.getInt(3)).toSeq == Seq(1, 2))
  }

  test("groups smaller than k return all rows; null scores are skipped") {
    val df = Seq(
      (0L, 1L, Some(0.9)), (0L, 2L, None), (1L, 3L, Some(0.1)))
      .toDF("g", "id", "score")
    val rows = viaAgg(df, 5).collect()
    assert(rows.length == 2) // null score never ranks
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L), (1L, 3L)))
  }

  test("NaN scores rank first, exactly like the window's DESC sort, regardless of arrival order") {
    // Spark sorts doubles NaN-greatest: a NaN cosine outranks every real
    // score under ORDER BY score DESC. The bounded heap must agree even
    // when the NaN arrives after the buffer is full (raw > / == both
    // return false for NaN — the bug shape this test pins).
    val nan = Double.NaN
    for (order <- Seq(
        Seq((0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, nan)),   // NaN last
        Seq((0L, 3L, nan), (0L, 1L, 0.9), (0L, 2L, 0.8)))) { // NaN first
      val df = order.toDF("g", "id", "score").repartition(1)
      val a = viaAgg(df, 2).orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getInt(3))).toSeq
      val w = viaWindow(df, 2).orderBy("rank").collect()
        .map(r => (r.getLong(1), r.getInt(3))).toSeq
      assert(a == w, s"agg $a vs window $w for input order $order")
      assert(a.head._1 == 3L, s"NaN row must rank first: $a")
    }
  }

  // ------------------------------------------------------- string ids

  private def viaAggStr(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKAgg.top_k_by_score_str($"score", $"id", k).as("tk"))
      .select($"g", posexplode($"tk"))
      .select($"g", $"col.neighbor_id".as("id"), $"col.cosine".as("score"),
        ($"pos" + 1).as("rank"))

  test("string ids equal the window formulation on random data with ties") {
    // same quantized-score collision setup as the long-id case; ids are
    // zero-padded so string order == numeric order is NOT assumed — mixed
    // widths ("id_7" vs "id_10") make binary string order differ from
    // numeric, which is exactly what both formulations must agree on
    val df = spark.range(0, 5000).select(
      ($"id" % 7).as("g"),
      concat(lit("id_"), $"id".cast("string")).as("id"),
      (floor(sin($"id") * 500) / lit(500.0)).as("score"))
      .repartition(13)
      .cache()
    for (k <- Seq(1, 5, 100)) {
      val a = viaAggStr(df, k).collect().map(_.toSeq).toSet
      val w = viaWindow(df, k).collect().map(_.toSeq).toSet
      assert(a == w, s"string agg/window divergence at k=$k")
    }
    df.unpersist()
  }

  test("string ids: NaN ranks first and ties break by binary string order") {
    val nan = Double.NaN
    val df = Seq(("g", "b", 1.0), ("g", "a", 1.0), ("g", "c", nan), ("g", "z", 0.5))
      .toDF("g", "id", "score").repartition(3)
    val a = viaAggStr(df, 3).orderBy("rank").collect().map(_.getString(1)).toSeq
    val w = viaWindow(df, 3).orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(a == w)
    assert(a == Seq("c", "a", "b")) // NaN first, then score ties a < b
  }

  test("string buffer: bounded size, serde round-trip, clone-on-accept") {
    import org.apache.spark.unsafe.types.UTF8String
    val buf = new TopKStrBuffer(3)
    // mutable backing array: the buffer must clone accepted ids (the
    // update path hands it UTF8Strings aliasing reused row memory)
    val backing = "a".getBytes("UTF-8")
    val aliased = UTF8String.fromBytes(backing)
    buf.insert(10.0, aliased, owned = false) // outranks every i % 7 score below
    backing(0) = 'z'.toByte // mutate after insert — a retained alias would see 'z'
    for (i <- 0 until 50) buf.insert(i % 7, UTF8String.fromString(s"k$i"), owned = false)
    assert(buf.size == 3)
    assert(buf.ids(0).toString == "a", "accepted id must be cloned, not aliased")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKByScoreStr(Literal(0.0), Literal(UTF8String.fromString(""),
      org.apache.spark.sql.types.StringType), Literal(3))
    val rt = agg.deserialize(agg.serialize(buf))
    assert(rt.size == buf.size)
    assert((0 until 3).forall(i => rt.scores(i) == buf.scores(i) && rt.ids(i) == buf.ids(i)))
  }

  test("buffer never holds more than k entries and serde round-trips") {
    val buf = new TopKBuffer(3)
    for (i <- 0 until 100) buf.insert(i.toDouble % 10, i.toLong)
    assert(buf.size == 3)
    assert(buf.scores.take(3).toSeq == Seq(9.0, 9.0, 9.0))
    assert(buf.ids.take(3).toSeq == Seq(9L, 19L, 29L)) // ties → id asc
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKByScore(Literal(0.0), Literal(0L), Literal(3))
    val rt = agg.deserialize(agg.serialize(buf))
    assert(rt.size == buf.size)
    assert(rt.scores.take(3).toSeq == buf.scores.take(3).toSeq)
    assert(rt.ids.take(3).toSeq == buf.ids.take(3).toSeq)
  }
}

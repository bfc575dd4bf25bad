package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra–Gries: multi-batch state carry (one file per
  * micro-batch), the order-immune sketch guarantees against exact
  * counts, and the ≤ k-distinct exactness contract — MG with no
  * evictions IS exact counting, regardless of how the stream is split
  * into batches or ordered within them.
  */
class HeavyHitterStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeFiles(batches: Seq[Seq[(String, Long)]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mg-stream").toString
    batches.foreach { rows =>
      rows.toDF("key", "item").coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private def run(dir: String, k: Int, name: String) = {
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    EventStreams.runToMemorySink(spark,
      EventStreams.heavyHittersStream(spark, stream, k),
      name, OutputMode.Update())
  }

  private def finalSnapshot(snap: org.apache.spark.sql.DataFrame) = {
    // re-alias the aggregate side: a memory-sink view self-join keeps
    // the same attribute ids on both sides and fails to resolve
    val maxN = snap.groupBy("key").agg(max("n_total").as("n_total"))
      .toDF("key2", "n_total2")
    snap.join(maxN,
      col("key") === col("key2") && col("n_total") === col("n_total2"))
      .drop("key2", "n_total2")
  }

  test("state carries across micro-batches: distinct items <= k is EXACT counting " +
       "whatever the file split") {
    val dir = writeFiles(Seq(
      Seq("m" -> 1L, "m" -> 1L, "m" -> 2L),
      Seq("m" -> 2L, "m" -> 1L),
      Seq("m" -> 2L, "m" -> 2L, "m" -> 1L)))
    val snap = run(dir, k = 2, "mg_exact")
    // multiple snapshots prove multi-batch execution
    assert(snap.select("n_total").distinct().count() == 3)
    val fin = finalSnapshot(snap).collect()
      .map(r => r.getLong(r.fieldIndex("item")) -> r.getLong(r.fieldIndex("est"))).toMap
    assert(fin == Map(1L -> 4L, 2L -> 4L))
    val h = finalSnapshot(snap).head()
    assert(h.getLong(h.fieldIndex("n_total")) == 8L)
  }

  test("eviction keeps the MG guarantees: heavy items present, estimates in the band") {
    // key "m": item 7 heavy (12 of 20), nine singletons force
    // decrements at k = 3
    val rows = Seq.fill(12)("m" -> 7L) ++ (1L to 8L).map(i => "m" -> (100L + i))
    val dir = writeFiles(rows.grouped(5).toSeq)
    val snap = run(dir, k = 3, "mg_evict")
    val fin = finalSnapshot(snap).collect()
      .map(r => r.getLong(r.fieldIndex("item")) -> r.getLong(r.fieldIndex("est"))).toMap
    val n = 20L
    // 12·(k+1) = 48 > 20 → item 7 MUST be tracked
    assert(fin.contains(7L), fin.toString)
    // every estimate obeys true − ⌊n/(k+1)⌋ ≤ est ≤ true
    val exact = Map(7L -> 12L) ++ (1L to 8L).map(i => (100L + i) -> 1L).toMap
    fin.foreach { case (item, est) =>
      val t = exact(item)
      assert(est <= t && est >= t - n / 4, s"item $item est $est true $t")
    }
  }

  test("keys are independent: one key's churn cannot evict another key's counters") {
    val rows = Seq.fill(4)("a" -> 1L) ++ (1L to 9L).map(i => "b" -> i)
    val dir = writeFiles(rows.grouped(4).toSeq)
    val fin = finalSnapshot(run(dir, k = 2, "mg_keys"))
      .collect().map(r => (r.getString(0), r.getLong(r.fieldIndex("item"))) ->
        r.getLong(r.fieldIndex("est"))).toMap
    assert(fin(("a", 1L)) == 4L) // untouched by b's eviction churn
  }
}

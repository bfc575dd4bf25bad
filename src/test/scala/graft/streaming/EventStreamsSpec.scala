package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch equivalence: the windowed aggregation run as a
  * Structured Streaming query over a bounded file source must equal its
  * batch twin on the same data (SURVEY §2.7 — streaming is an extension).
  */
class EventStreamsSpec extends AnyFunSuite with SparkSpec {

  test("canonical events.parquet streams directly via readNsEventStream") {
    val path = "/root/testdata/sf0.001/events.parquet"
    // the streaming file source wants a directory; link the canonical
    // read-only file into one
    val dir = java.nio.file.Files.createTempDirectory("graft-nsdir")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val streamed = EventStreams.runToMemorySink(
      spark,
      EventStreams.windowedAgg(
        EventStreams.readNsEventStream(spark, dir.toString).withWatermark("ts", "1 hour")),
      "ns_stream")
      .collect().map(_.toSeq).toSet
    val batch = EventStreams.windowedAgg(
      EventStreams.normalizeTs(spark.read.parquet(path)))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming windowed agg over bounded input equals the batch twin") {
    // materialize sf0.001 events (ts normalized) as a proper parquet dir
    val batchInput = EventStreams.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchInput.write.mode("overwrite").parquet(dir)

    val expected = EventStreams.windowedAgg(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet

    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.streamingWindowedAgg(spark, dir), "stream_test")
      .collect().map(_.toSeq).toSet

    assert(streamed == expected)
    assert(streamed.nonEmpty)
  }

  test("runToCompleteTable equals the memory sink and survives a rerun") {
    val batchInput = EventStreams.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ctbl").toString
    batchInput.write.mode("overwrite").parquet(dir)

    val viaMemory = EventStreams.runToMemorySink(
      spark, EventStreams.streamingWindowedAgg(spark, dir), "ctbl_mem")
      .collect().map(_.toSeq).toSet
    val viaTable = EventStreams.runToCompleteTable(
      spark, EventStreams.streamingWindowedAgg(spark, dir), "ctbl_out")
      .collect().map(_.toSeq).toSet
    assert(viaTable == viaMemory && viaTable.nonEmpty)

    // the result is a real distributed scan, not a driver-resident
    // LocalTableScan re-shipped inside the task
    val plan = spark.table("ctbl_out").queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), plan)

    // rerun overwrites in place (fresh checkpoint => full replay): the
    // managed table must come back identical, not doubled
    val rerun = EventStreams.runToCompleteTable(
      spark, EventStreams.streamingWindowedAgg(spark, dir), "ctbl_out")
      .collect().map(_.toSeq).toSet
    assert(rerun == viaMemory)
  }

  test("stream-static enrichment join equals the batch twin; no join state") {
    val batchInput = EventStreams.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich").toString
    batchInput.write.mode("overwrite").parquet(dir)
    val dim = spark.read.parquet(dir).select("event_type").distinct()
      .select(col("event_type"),
        length(col("event_type")).cast("long").as("weight"),
        substring(col("event_type"), 1, 1).as("category"))

    val expected = EventStreams.enrichedWindowedAgg(spark.read.parquet(dir), dim)
      .collect().map(_.toSeq).toSet
    // this dir is already micros-typed — stream it with its own schema
    // (readNsEventStream is only for the canonical ns layout)
    val streamedDf = EventStreams.enrichedWindowedAgg(
      spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)
        .withWatermark("ts", "1 hour"),
      dim)
    val streamed = EventStreams.runToMemorySink(spark, streamedDf, "enrich_test")
      .collect().map(_.toSeq).toSet
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("hopping windows: hand-computed membership; streaming twin equal") {
    import spark.implicits._
    // 00:10 belongs to starts 23:15/23:30/23:45/00:00; 00:20 to
    // 23:30/23:45/00:00/00:15 (1h windows sliding every 15 min)
    val evs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 1L, "view", 2.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 1L, "view", 3.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStreams.hoppingAgg(evs)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
    assert(out == Set(
      ("2023-12-31 23:15:00", 1L, 2.0),
      ("2023-12-31 23:30:00", 2L, 5.0),
      ("2023-12-31 23:45:00", 2L, 5.0),
      ("2024-01-01 00:00:00", 2L, 5.0),
      ("2024-01-01 00:15:00", 1L, 3.0)))
    // streaming twin over real data: watermark state holds w/s windows
    // per key and the result still matches the batch plan exactly
    val batchInput = EventStreams.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hop").toString
    batchInput.write.mode("overwrite").parquet(dir)
    val expected = EventStreams.hoppingAgg(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSet
    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.streamingHoppingAgg(spark, dir), "hop_test")
      .collect().map(_.toSeq).toSet
    assert(streamed == expected && streamed.nonEmpty)
  }
}

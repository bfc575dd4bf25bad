package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeDupFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    def row(id: Long, t: String, u: Long) =
      (id, java.sql.Timestamp.valueOf(t), u, "x", 1.0, "{}")
    // event 1 appears twice within the watermark horizon
    Seq(row(1L, "2024-01-01 10:00:00", 1), row(1L, "2024-01-01 10:10:00", 1),
        row(2L, "2024-01-01 10:20:00", 1), row(3L, "2024-01-01 11:00:00", 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("dedup state spans micro-batches: a duplicate in a LATER batch is dropped") {
    // the duplicate arrives two micro-batches after the original (one
    // row per file, sequential writes → one batch per row) — only
    // cross-batch state can suppress it
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-mb").toString
    def row(id: Long, t: String, u: Long) =
      (id, java.sql.Timestamp.valueOf(t), u, "x", 1.0, "{}")
    for (r <- Seq(
        row(1L, "2024-01-01 10:00:00", 1),
        row(2L, "2024-01-01 10:05:00", 1),
        row(1L, "2024-01-01 10:10:00", 1), // cross-batch duplicate
        row(3L, "2024-01-01 11:00:00", 2)))
      Seq(r).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    val streamed = EventStreams.runToMemorySink(
      spark,
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(Seq("event_id")),
      "sdedup_mb", org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).sortBy(_._1).toSeq
    // first arrival of id 1 won; the batch-3 duplicate was suppressed
    assert(streamed == Seq(
      (1L, "2024-01-01 10:00:00.0"),
      (2L, "2024-01-01 10:05:00.0"),
      (3L, "2024-01-01 11:00:00.0")))
  }

  test("streaming dedup within watermark equals batch dropDuplicates") {
    val dir = writeDupFixture()
    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.streamingDedup(spark, dir), "sdedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == Seq(1L, 2L, 3L))
  }

  test("streaming dedup equals the batch twin (earliest arrival wins)") {
    val dir = writeDupFixture()
    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.streamingDedup(spark, dir), "sdedup_twin",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).sortBy(_._1).toSeq
    val twin = EventStreams.dedupBatchTwin(spark.read.parquet(dir))
      .select("event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).sortBy(_._1).toSeq
    assert(streamed == twin)
  }

  test("foreachBatch sink lands micro-batches in a managed table, idempotent under replay") {
    val dir = writeDupFixture()
    spark.sql("DROP TABLE IF EXISTS stream_landing")
    EventStreams.runToTable(
      EventStreams.streamingDedup(spark, dir), "stream_landing")
    assert(spark.table("stream_landing").count() == 3)
    // replay the same micro-batch (no checkpoint -> batch ids restart at
    // 0): the batch-id partition overwrite must land the SAME rows, not
    // append a second copy — foreachBatch is at-least-once
    EventStreams.runToTable(
      EventStreams.streamingDedup(spark, dir), "stream_landing")
    // this session read the table before the replay; the overwrite
    // replaced files in place, so refresh the cached listing (see
    // runToTable scaladoc — standard overwritten-table contract)
    spark.catalog.refreshTable("stream_landing")
    assert(spark.table("stream_landing").count() == 3)
    spark.sql("DROP TABLE stream_landing")
  }
}

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

  test("nearDupVsHistory: hand pairs on the batch path; threshold respected") {
    val history = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "completely different text about spark engines and scala compilers running distributed jobs")
    ).toDF("doc_id", "text")
    val stream = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // == 0
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"), // j=0.6 vs 0
      (12L, "entirely novel content that matches nothing in the historical corpus at all")
    ).toDF("doc_id", "text")
    val at55 = CorpusStreams.nearDupVsHistory(stream, history, "doc_id", "text", 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(at55 == Seq((10L, 0L, 1.0), (11L, 0L, 0.6)), at55.toString)
    val at80 = CorpusStreams.nearDupVsHistory(stream, history, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(at80 == Seq((10L, 0L))) // the j=0.6 pair falls below 0.8
  }

  test("nearDupVsHistory streams STATELESSLY and equals the batch twin across batches") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.where(col("doc_id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("graft-snd").toString
    // 4 files -> 4 micro-batches under maxFilesPerTrigger=1: the result
    // must not depend on how the feed is batched (pure stateless plan)
    docs.where(col("doc_id") >= 100).repartition(4)
      .write.mode("overwrite").parquet(dir)
    val expected = CorpusStreams.nearDupVsHistory(
      spark.read.parquet(dir), history, "doc_id", "text", 0.8)
      .collect().map(_.toSeq).toSet
    val streamDf = CorpusStreams.nearDupVsHistory(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir),
      history, "doc_id", "text", 0.8)
    val q = streamDf.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("memory").queryName("snd_test")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // stateless by construction: no state-store operator ever ran (the
    // band-collision dedup is the algebraic first-agreeing-band filter,
    // not a stateful dropDuplicates)
    assert(q.recentProgress.nonEmpty)
    assert(q.recentProgress.forall(_.stateOperators.isEmpty),
      q.recentProgress.map(_.stateOperators.length).mkString(","))
    assert(q.recentProgress.map(_.numInputRows).sum >= 4) // really multi-batch
    val streamed = spark.table("snd_test").collect().map(_.toSeq).toSet
    assert(streamed == expected && streamed.nonEmpty)
  }

  test("written band index: write->load->probe equals the direct gate, geometry survives") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val history = docs.where(col("doc_id") < 100)
    val probe = docs.where(col("doc_id") >= 100)
    try {
      CorpusStreams.indexHistory(history, "doc_id", "text", "snd_idx_spec",
        n = 3, k = 64, bands = 16, numBuckets = 4)
      val idx = CorpusStreams.loadIndex(spark, "snd_idx_spec")
      // the load is self-describing: probing uses the WRITTEN geometry
      assert((idx.n, idx.k, idx.bandCount) == ((3, 64, 16)))
      val viaIndex = CorpusStreams.nearDupVsIndex(probe, idx, "doc_id", "text", 0.8)
        .collect().map(_.toSeq).toSet
      val direct = CorpusStreams.nearDupVsHistory(probe, history, "doc_id", "text",
        0.8, n = 3, k = 64, bands = 16)
        .collect().map(_.toSeq).toSet
      assert(viaIndex == direct && viaIndex.nonEmpty)
      // and the STREAMING probe of the same loaded index agrees too
      val dir = java.nio.file.Files.createTempDirectory("graft-snd-idx").toString
      probe.write.mode("overwrite").parquet(dir)
      val streamed = EventStreams.runToMemorySink(
        spark,
        CorpusStreams.nearDupVsIndex(
          spark.readStream.schema(docs.schema).parquet(dir), idx, "doc_id", "text", 0.8),
        "snd_idx_stream", org.apache.spark.sql.streaming.OutputMode.Append())
        .collect().map(_.toSeq).toSet
      assert(streamed == direct)
    } finally Seq("_sigs", "_bands", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS snd_idx_spec$s"))
  }
}

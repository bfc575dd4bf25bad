package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sessionization equivalence. Bounded file streams only emit
  * watermark-finalized state when a later microbatch advances the
  * watermark, so the fixtures append far-future sentinel events as extra
  * files (maxFilesPerTrigger=1 → one batch per file → two sentinel
  * batches flush everything real).
  */
class StatefulStreamsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val real = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:20:00", 2.0),
      (1L, "2024-01-01 13:00:00", 3.0), // new session after 2h40m gap
      (2L, "2024-01-01 10:05:00", 4.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("x"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    real.coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((-1L, "2024-02-01 00:00:00"), (-1L, "2024-03-01 00:00:00")).zipWithIndex.foreach {
      case ((u, t), i) =>
        Seq((999L + i, t, u)).toDF("event_id", "t", "user_id")
          .withColumn("ts", to_timestamp(col("t"))).drop("t")
          .withColumn("event_type", lit("sentinel"))
          .withColumn("value", lit(0.0))
          .withColumn("props", lit("{}"))
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  /** sf0.001 events (ns→µs converted) split into 4 files by TIME RANGE,
    * written sequentially so the file source (mtime order) replays them
    * oldest-first — each micro-batch is strictly newer than the last, so
    * the advancing watermark never drops input and the multi-batch run
    * must equal the single-batch run bit-for-bit. Random (hash) splits
    * would NOT have this property: every file would span the whole time
    * range and later batches would lose rows behind the watermark —
    * exactly the arrival contract a production file feed provides and
    * this fixture encodes.
    */
  private lazy val rangeSplitDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mbatch").toString
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = graft.streaming.EventStreams.normalizeTs(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts").asc, col("event_id").asc)
      val split = ev.withColumn("part", ntile(4).over(w)).cache()
      try {
        // sequential single-file writes → strictly increasing mtimes
        for (i <- 1 to 4)
          split.where(col("part") === i).drop("part")
            .coalesce(1).write.mode("append").parquet(dir)
      } finally split.unpersist()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    dir
  }

  /** Run to a memory sink counting non-empty micro-batches. */
  private def runCounting(df: org.apache.spark.sql.DataFrame, name: String): (Set[Seq[Any]], Int) = {
    import org.apache.spark.sql.streaming.Trigger
    val q = df.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.table(name).collect().map(_.toSeq).toSet, batches)
  }

  test("e7/e8/e9 state is correct ACROSS micro-batches: maxFilesPerTrigger=1 equals one batch") {
    // the driver-gated streaming queries run AvailableNow over one
    // bounded input = one data micro-batch; this drives the same
    // pipelines one FILE per trigger so windows, sessions, and the
    // per-batch dim join carry state across many watermark advances
    val dir = rangeSplitDir
    val staticDf = spark.read.parquet(dir)
    val dim = staticDf.select("event_type").distinct()
      .select(col("event_type"),
        length(col("event_type")).cast("long").as("weight"),
        substring(col("event_type"), 1, 1).as("category"))
    def stream(multiBatch: Boolean) = {
      val r = spark.readStream.schema(staticDf.schema)
      (if (multiBatch) r.option("maxFilesPerTrigger", "1") else r)
        .parquet(dir).withWatermark("ts", "1 hour")
    }
    val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("e7", EventStreams.windowedAgg(_, "1 hour")),
      ("e8", EventStreams.sessionAgg(_, "1 hour")),
      ("e9", EventStreams.enrichedWindowedAgg(_, dim)))
    for ((name, pipeline) <- cases) {
      val (multi, nBatches) = runCounting(pipeline(stream(multiBatch = true)), s"mb_$name")
      val (single, oneBatch) = runCounting(pipeline(stream(multiBatch = false)), s"sb_$name")
      assert(nBatches >= 4, s"$name: expected one batch per file, got $nBatches")
      assert(oneBatch == 1, s"$name: single-batch control ran $oneBatch batches")
      assert(multi == single, s"$name: multi-batch result diverges from single-batch")
      val batchTwin = pipeline(staticDf).collect().map(_.toSeq).toSet
      assert(multi == batchTwin, s"$name: streaming result diverges from the batch twin")
      assert(multi.nonEmpty)
    }
  }

  test("session_window streaming (append) matches batch sessions for flushed users") {
    val dir = writeFixture()
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "1 hour")
    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.sessionAgg(stream), "sess_stream", OutputMode.Append())
      .where(col("user_id") >= 0).collect().map(_.toSeq).toSet

    val batch = EventStreams.sessionAgg(
      spark.read.parquet(dir).where(col("user_id") >= 0))
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
    assert(streamed.size == 3) // user1 x2 sessions, user2 x1
  }

  test("flatMapGroupsWithState emits the same sessions once watermark passes") {
    val dir = writeFixture()
    val stream = spark.readStream
      .schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "1 hour")
    val streamed = EventStreams.runToMemorySink(
      spark, EventStreams.flatMapSessions(spark, stream, 3600), "fmgws_stream",
      OutputMode.Append())
      .where(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"), col("value_sum"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("s"))
      .collect().map(_.toSeq).toSet

    assert(streamed == Set(
      Seq(1L, 2L, 3.0, "2024-01-01 10:00:00"),
      Seq(1L, 1L, 3.0, "2024-01-01 13:00:00"),
      Seq(2L, 1L, 4.0, "2024-01-01 10:05:00")))
  }
}

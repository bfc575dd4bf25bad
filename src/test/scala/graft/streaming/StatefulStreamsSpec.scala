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

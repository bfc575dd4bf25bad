package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CUSUM equivalence: one file per day, one micro-batch per
  * file, two far-future sentinel batches to flush (the bounded-stream
  * watermark contract), emitted trajectory equal to the batch twin.
  */
class CusumStreamSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // daily cents 100, 500, 200, 700, 300 against target 300 / threshold
  // 150 → cusum 0, 200, 100, 500, 500; alarms on days 2, 4, 5
  private val days = Seq(
    ("2024-01-01", 1.00), ("2024-01-02", 5.00), ("2024-01-03", 2.00),
    ("2024-01-04", 7.00), ("2024-01-05", 3.00))

  private def eventRow(t: String, v: Double, id: Long) =
    Seq((id, t, 7L, "m", v, "{}"))
      .toDF("event_id", "t", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def writeFixture(withLate: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cusum-stream").toString
    days.zipWithIndex.foreach { case ((d, v), i) =>
      eventRow(s"$d 12:00:00", v, i.toLong)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    if (withLate) // a duplicate for already-closed day 2, arriving late
      eventRow("2024-01-02 13:00:00", 99.0, 98L)
        .coalesce(1).write.mode("append").parquet(dir)
    Seq("2024-02-01 00:00:00", "2024-03-01 00:00:00").zipWithIndex.foreach {
      case (t, i) =>
        eventRow(t, 0.0, 900L + i)
          .withColumn("event_type", lit("sentinel"))
          .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private val targets = Seq(("m", 300L, 150L))
    .toDF("key", "target_cents", "threshold_cents")

  private def run(dir: String, name: String): Set[Seq[Any]] = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "1 hour")
    val out = EventStreams.cusumStream(spark, stream, targets)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).collect().map(_.toSeq).toSet
  }

  test("cusumStream: per-day trajectory across 7 micro-batches equals the batch twin") {
    val dir = writeFixture(withLate = false)
    val got = run(dir, "cusum_mb")
    val batchEvents = spark.read.parquet(dir)
      .where(col("event_type") === "m")
    val daily = graft.ops.TimeSeries.dailySeries(batchEvents, "event_type", "ts", "value")
    val want = graft.ops.TimeSeries.cusumDaily(daily, targets)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 5)
    // hand-pinned alarm days: cusum 200/500/500 over threshold 150
    val alarms = got.filter(_.last == 1).map(r => r(1)).toSet
    assert(alarms == Set(19724L, 19726L, 19727L)) // 2024-01-02/04/05
  }

  test("cusumStream: a late event for an already-closed day is dropped, never re-opens history") {
    val dir = writeFixture(withLate = true)
    val got = run(dir, "cusum_late")
    // expected = batch twin WITHOUT the late duplicate
    val batchEvents = spark.read.parquet(dir)
      .where(col("event_type") === "m" && col("event_id") =!= 98L)
    val daily = graft.ops.TimeSeries.dailySeries(batchEvents, "event_type", "ts", "value")
    val want = graft.ops.TimeSeries.cusumDaily(daily, targets)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"late event leaked into closed state:\ngot $got\nwant $want")
  }
}

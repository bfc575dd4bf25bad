package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeEvents(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin").toString
    def row(id: Long, t: String, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 1.0, "{}")
    Seq(
      row(1L, "2024-01-01 10:00:00", 1, "signup"),
      row(2L, "2024-01-02 09:00:00", 1, "click"),  // within 7d of signup
      row(3L, "2024-01-20 09:00:00", 1, "click"),  // beyond horizon
      row(4L, "2024-01-01 08:00:00", 2, "click"),  // click BEFORE signup
      row(5L, "2024-01-01 09:00:00", 2, "signup"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("stream-stream join state carries ACROSS micro-batches and evicts by watermark") {
    // one row per FILE, written sequentially in event-time order →
    // maxFilesPerTrigger=1 replays one row per micro-batch. Cross-batch
    // state is the whole point: u2's click arrives two batches BEFORE
    // its signup (stored click state consulted later, correctly no
    // match — click precedes signup); u1's click arrives one batch
    // AFTER its signup (stored signup state joins it); the Jan 20
    // click advances the watermark past signup+7d, exercising eviction.
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin-mb").toString
    def row(id: Long, t: String, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 1.0, "{}")
    for (r <- Seq(
        row(4L, "2024-01-01 08:00:00", 2, "click"),
        row(5L, "2024-01-01 09:00:00", 2, "signup"),
        row(1L, "2024-01-01 10:00:00", 1, "signup"),
        row(2L, "2024-01-02 09:00:00", 1, "click"),
        row(3L, "2024-01-20 09:00:00", 1, "click")))
      Seq(r).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    def attributed(multiBatch: Boolean): Set[Seq[Any]] = {
      val r = spark.readStream.schema(EventStreams.eventSchema)
      val stream = (if (multiBatch) r.option("maxFilesPerTrigger", "1") else r).parquet(dir)
      val out = EventStreams.clickAttribution(
        stream.where(col("event_type") === "click").withWatermark("ts", "1 hour"),
        stream.where(col("event_type") === "signup").withWatermark("ts", "1 hour"))
      EventStreams.runToMemorySink(spark, out,
        s"ssjoin_mb_$multiBatch", OutputMode.Append())
        .collect().map(_.toSeq).toSet
    }
    val multi = attributed(multiBatch = true)
    assert(multi == attributed(multiBatch = false))
    assert(multi.map(_.head) == Set(2L)) // only the in-horizon click
  }

  test("stream-stream time-bounded join equals the batch twin") {
    val dir = writeEvents()
    def split(df: org.apache.spark.sql.DataFrame) =
      (df.where(col("event_type") === "click"), df.where(col("event_type") === "signup"))

    val (bc, bs) = split(spark.read.parquet(dir))
    val batch = EventStreams.clickAttribution(bc, bs)
      .collect().map(_.toSeq).toSet
    assert(batch.map(_.head) == Set(2L)) // only the in-horizon click

    val stream = spark.readStream.schema(EventStreams.eventSchema).parquet(dir)
    val (sc, ss) = split(stream)
    val streamed = EventStreams.runToMemorySink(
      spark,
      EventStreams.clickAttribution(
        sc.withWatermark("ts", "1 hour"), ss.withWatermark("ts", "1 hour")),
      "ssjoin", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("LEFT-OUTER stream-stream join emits unmatched clicks on watermark expiry, multi-batch == batch twin") {
    // one row per file → one row per micro-batch. The outer rows are
    // the point: u2's click precedes its signup (must emit UNMATCHED,
    // but only once the watermark proves no earlier signup can still
    // arrive), and the Jan 20 click is beyond u1's horizon (unmatched
    // too). The far-future SENTINEL SIGNUP pushes the watermark past
    // every click's horizon so the outer tail flushes — signups are
    // the join's right side, so the sentinel itself can't appear in
    // the output. Without it, clicks still inside their horizon would
    // sit in state unemitted (the documented outer-tail contract).
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjoin-outer").toString
    def row(id: Long, t: String, u: Long, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, 1.0, "{}")
    val rows = Seq(
      row(4L, "2024-01-01 08:00:00", 2, "click"),
      row(5L, "2024-01-01 09:00:00", 2, "signup"),
      row(1L, "2024-01-01 10:00:00", 1, "signup"),
      row(2L, "2024-01-02 09:00:00", 1, "click"),
      row(3L, "2024-01-20 09:00:00", 1, "click"),
      // Sentinels must advance BOTH sides: the global watermark is the
      // MIN across the two withWatermark nodes, so a signup-only
      // sentinel leaves the click-side watermark at Jan 20 and the
      // outer tail in state forever. The matched far-future pair moves
      // both sides (and appears, attributed, in batch and stream
      // alike); the final signup then gives the engine a batch that
      // RUNS under the advanced watermark — outer-row eviction happens
      // during a batch, and AvailableNow runs no trailing no-data
      // batch, so the flush needs one more trigger after the advance
      row(99L, "2024-03-01 00:00:00", 9, "signup"),
      row(101L, "2024-03-01 00:01:00", 9, "click"),
      row(100L, "2024-03-02 00:00:00", 9, "signup"))
    for (r <- rows)
      Seq(r).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)

    def split(df: org.apache.spark.sql.DataFrame) =
      (df.where(col("event_type") === "click"), df.where(col("event_type") === "signup"))

    val (bc, bs) = split(spark.read.parquet(dir))
    val batch = EventStreams.clickAttributionOuter(bc, bs)
      .collect().map(_.toSeq).toSet
    // clicks 3 and 4 are outer rows; clicks 2 and the sentinel click
    // attributed
    assert(batch.map(r => (r.head, r.last)) ==
      Set((2L, 1), (3L, 0), (4L, 0), (101L, 1)))

    val stream = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val (sc, ss) = split(stream)
    val streamed = EventStreams.runToMemorySink(
      spark,
      EventStreams.clickAttributionOuter(
        sc.withWatermark("ts", "1 hour"), ss.withWatermark("ts", "1 hour")),
      "ssjoin_outer", OutputMode.Append())
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("scd2Enrich: event-time version pick is batch-split-invariant; " +
       "boundary joins the NEW version, pre-history is NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-mb").toString
    def row(id: Long, t: String) =
      (id, java.sql.Timestamp.valueOf(t), 1L, "click", 1.0, "{}")
    // one file per event → maxFilesPerTrigger=1 = one micro-batch each
    for (r <- Seq(
        row(1L, "2024-01-01 09:00:00"),   // before any version → NULL
        row(2L, "2024-01-01 10:00:00"),   // AT v1's eff_from → v1 (>= boundary)
        row(3L, "2024-01-01 12:30:00")))  // inside the open-ended v2
      Seq(r).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    val dim = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        Some(java.sql.Timestamp.valueOf("2024-01-01 12:00:00")), 100L),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
        None: Option[java.sql.Timestamp], 200L))
      .toDF("key", "version", "eff_from", "eff_to", "tier_cents")
    def run(multiBatch: Boolean): Map[Long, Option[Long]] = {
      val r = spark.readStream.schema(EventStreams.eventSchema)
      val stream = (if (multiBatch) r.option("maxFilesPerTrigger", "1") else r).parquet(dir)
      EventStreams.runToMemorySink(spark,
        EventStreams.scd2Enrich(stream, dim).select(col("event_id"), col("version")),
        s"scd2_mb_$multiBatch", OutputMode.Append())
        .collect()
        .map(r0 => r0.getLong(0) ->
          (if (r0.isNullAt(1)) None else Some(r0.getLong(1)))).toMap
    }
    val multi = run(multiBatch = true)
    assert(multi == run(multiBatch = false))
    assert(multi == Map(1L -> None, 2L -> Some(1L), 3L -> Some(2L)))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming surface of the engine.
  *
  * The reference is batch-only (SURVEY §2.7), so streaming is a capability
  * extension built on the `events` table shape (event_id, ts, user_id,
  * event_type, value, props). Design:
  *   - event-time processing with watermarks (late data bounded, state
  *     bounded — the only way streaming aggregation survives at scale);
  *   - tumbling-window aggregation as the bread-and-butter op;
  *   - the batch twin of each streaming query shares the same column
  *     logic, so correctness is checked in batch (DuckDB oracle) and the
  *     streaming path is verified by equivalence on a bounded input.
  */
object EventStreams {

  /** Input row for [[flatMapSessions]] (top-level for encoder derivation). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  case class CusumEv(key: String, ts: java.sql.Timestamp, cents: Long,
    target: Long, threshold: Long)

  case class CusumState(lastClosedDay: Long, s: Long, minS: Long,
    target: Long, threshold: Long, openDays: Map[Long, Long])
  /** Open-session state for [[flatMapSessions]]: bounds in epoch micros. */
  case class Open(start: Long, end: Long, n: Long, sum: Double)

  /** Input/state rows for [[heavyHittersStream]] (top-level for encoder
    * derivation). */
  case class MgEv(key: String, item: Long)
  case class MgState(n: Long, counters: Map[Long, Long])

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Normalize the canonical events table's `ts` to a plain session-tz
    * TIMESTAMP, whatever physical layout the file carries. Layouts seen
    * across testdata generations:
    *   - parquet TIMESTAMP(NANOS), which Spark reads as a raw BIGINT
    *     under `spark.sql.legacy.parquet.nanosAsLong` → truncating
    *     integer ns→µs division (`div`, NOT `/` — double division rounds
    *     on the 0.25 µs double grid at 2024-epoch magnitudes, diverging
    *     from DuckDB's truncating cast);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
    *     TIMESTAMP_NTZ → cast to TIMESTAMP (every engine session pins
    *     spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *     and DuckDB — which reads the same file as a naive TIMESTAMP —
    *     sees identical wall-clock values);
    *   - TIMESTAMP already → pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported physical type ${other.sql}")
  }

  /** Stream the CANONICAL events.parquet, whatever ts layout it carries
    * (see [[normalizeTs]]): peeks at the batch-read schema (footer-only,
    * no data scan), declares it on the file stream source, and applies
    * the same normalization as the batch reader (`SparkEntry.events`),
    * so streaming queries consume the same files as their batch twins.
    */
  def readNsEventStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nsSchema = spark.read.parquet(path).schema
    // the file stream source wants a DIRECTORY; a single-file path (the
    // canonical layout: <sfDir>/events.parquet) streams via its parent
    // plus a glob filter. Resolved through the Hadoop FS so URI-schemed
    // paths (file:/, hdfs://, s3a://) and bare relative names work; the
    // literal file name is glob-escaped.
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.schema(nsSchema)
    val stream =
      if (fs.isFile(hp)) {
        val escaped = hp.getName.replaceAll("([\\[\\]{}*?\\\\])", "\\\\$1")
        reader.option("pathGlobFilter", escaped).parquet(hp.getParent.toString)
      } else reader.parquet(path)
    normalizeTs(stream)
  }

  /** Tumbling-window count/sum per event_type — shared logic for the
    * batch oracle twin and the streaming query.
    */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      // exact decimal sum (like every other aggregate in the engine):
      // double summation order differs between the batch plan and the
      // streaming state store, so a raw double sum breaks the
      // batch/stream equivalence contract at rounding boundaries
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** HOPPING (sliding) windows — each event lands in windowLength/slide
    * overlapping windows (the smoothed-rate view dashboards want: an
    * hourly metric refreshed every 15 minutes). Same column logic and
    * exact-decimal discipline as [[windowedAgg]]; `window(ts, w, s)`
    * expands to the window set in-pipeline (a projection fan-out of
    * w/s rows per event, shuffled once on (window, type) — no
    * self-join, and the fan-out factor is the FIXED ratio w/s, never
    * data-dependent). Window starts align to the epoch slide grid,
    * matching the portable integer floor-division oracle.
    */
  def hoppingAgg(
      events: DataFrame,
      windowLength: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming twin of [[hoppingAgg]] — the state story is identical to
    * the tumbling case (watermark closes windows whose END passed), just
    * w/s live windows per key instead of one.
    */
  def streamingHoppingAgg(
      spark: SparkSession,
      path: String,
      watermark: String = "1 hour",
      windowLength: String = "1 hour",
      slide: String = "15 minutes"): DataFrame = {
    val events = spark.readStream.schema(eventSchema).parquet(path)
    hoppingAgg(events.withWatermark("ts", watermark), windowLength, slide)
  }

  /** Read a parquet directory as a bounded stream (file-source), apply the
    * watermark, and run the windowed aggregation.
    */
  def streamingWindowedAgg(
      spark: SparkSession,
      path: String,
      watermark: String = "1 hour",
      windowLength: String = "1 hour"): DataFrame = {
    val events = spark.readStream.schema(eventSchema).parquet(path)
    windowedAgg(events.withWatermark("ts", watermark), windowLength)
  }

  /** OHLC bars as PICK AGGREGATES — `min_by`/`max_by` over the
    * (ts, event_id) total order — rather than the batch query's two
    * row_number windows (e24): window FUNCTIONS cannot run under
    * streaming state, pick AGGREGATES can, and over a total order the
    * two formulations provably agree (which is exactly what the e27
    * oracle checks, being e24's SQL restated). Works for both the
    * batch twin and the watermarked stream.
    */
  def ohlcAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("n_events"), col("total_value"))

  /** Stream-static enrichment: join each micro-batch against a (small,
    * slowly-changing) dimension table, then roll up per window and
    * dimension attribute — the standard streaming-dimension pattern.
    * Spark plans the static side as a broadcast hash join inside every
    * micro-batch with NO join state in the state store (only the window
    * aggregation keeps state, bounded by the watermark); at cluster
    * scale the dimension refreshes by re-reading its table between
    * triggers, never by restarting the query. Shared column logic with
    * the batch twin — the oracle covers both executions.
    */
  def enrichedWindowedAgg(
      events: DataFrame,
      dim: DataFrame,
      dimKey: String = "event_type",
      attrCol: String = "category",
      weightCol: String = "weight",
      windowLength: String = "1 hour"): DataFrame =
    events
      .join(dim, Seq(dimKey))
      .groupBy(window(col("ts"), windowLength).as("w"), col(attrCol))
      .agg(count(lit(1)).as("n_events"),
        // exact decimal arithmetic end-to-end (weight is integral), cast
        // to double only at the boundary — same contract as windowedAgg
        sum(col("value").cast("decimal(18,2)") * col(weightCol)).cast("double")
          .as("weighted_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col(attrCol), col("n_events"), col("weighted_value"))

  /** Stream-static SCD2 as-of enrichment: each event picks up the
    * dimension VERSION valid at its event time (`ts ∈ [eff_from,
    * eff_to)`, open-ended current version) — the temporal-dimension
    * join every event pipeline needs ("which loyalty tier / price book
    * / config was active when this happened"), as a STREAM. Stream-
    * static joins are STATELESS: each micro-batch plans an ordinary
    * join against the dimension snapshot, so there is no watermark
    * requirement and no state store — the streaming-legal form of the
    * batch as-of join for the slowly-changing-dimension case (bounded
    * versions per key; the general nearest-event as-of needs e4's
    * machinery).
    *
    * LEFT OUTER, stream side preserved: events before their key's first
    * version carry NULL — dropping them would silently shrink the
    * stream. SCD2 intervals are disjoint by construction so at most one
    * version matches; a zero-length version (two changes at the same
    * instant) matches nothing, deterministically.
    *
    * @param dim static SCD2 table: (key, version, eff_from,
    *            eff_to — NULL for current, attrs…)
    * @param keyCol the stream column matching `dim.key`
    */
  def scd2Enrich(
      events: DataFrame,
      dim: DataFrame,
      keyCol: String = "user_id"): DataFrame = {
    val e = events.as("e")
    val d = dim.as("d")
    e.join(d,
      col(s"e.$keyCol") === col("d.key") &&
        col("e.ts") >= col("d.eff_from") &&
        (col("d.eff_to").isNull || col("e.ts") < col("d.eff_to")),
      "left_outer")
      .drop(col("d.key"))
  }

  /** Gap-session aggregation via the built-in `session_window` — works
    * identically as a batch plan and a streaming plan (with watermark),
    * which is how the twin-equivalence test proves the streaming path.
    * This is the idiomatic large-scale form: state is bounded by the
    * watermark, sessions merge incrementally, no custom state code.
    */
  def sessionAgg(events: DataFrame, gap: String = "1 hour"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Streaming gap-sessionization with session_window + watermark. */
  def streamingSessionAgg(
      spark: SparkSession,
      path: String,
      watermark: String = "1 hour",
      gap: String = "1 hour"): DataFrame = {
    val events = spark.readStream.schema(eventSchema).parquet(path)
    sessionAgg(events.withWatermark("ts", watermark), gap)
  }

  /** Custom-state sessionization via flatMapGroupsWithState — the escape
    * hatch for session semantics `session_window` can't express (e.g.
    * value-dependent gaps, per-session caps). Emits a session when the
    * event-time gap closes it; the final open session per user is emitted
    * on event-time timeout (needs the watermark to pass it).
    *
    * State per user is O(1) (one open session), the grouping shuffle is
    * keyed by user — uniform at scale.
    */
  def flatMapSessions(
      spark: SparkSession,
      events: DataFrame,
      gapSeconds: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState

    val out = events
      // Ev's fields are non-nullable primitives: a null user_id/ts row
      // would kill the whole query at decode (sessionization is
      // undefined without a key and an event time — drop, don't crash)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Open, (Long, Long, Long, Long, Double)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Open]) =>
          val gapMicros = gapSeconds * 1000000L
          var open = state.getOption
          // running chain of too-late events (predating the open session
          // by more than the gap): they arrive sorted within the batch,
          // so ONE open late chain merges consecutive late events that
          // fall within a gap of each other — emitting each as its own
          // singleton would fragment a genuine late session. Residual
          // divergence from the batch twin: a late chain is never
          // re-spliced into the open session even if a bridging event
          // later closes the time hole — O(1) state can't re-open
          // emitted history; the guarantee is per-batch greedy merging.
          var lateOpen: Option[Open] = None
          val closed = scala.collection.mutable.ArrayBuffer.empty[Open]
          evs.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos)).foreach { e =>
            val t = e.ts.getTime * 1000L + e.ts.getNanos / 1000 % 1000
            open match {
              // within gap of either session bound (late arrivals are NOT
              // dropped by flatMapGroupsWithState): merge, extending both
              // bounds — a signed end-only check would wrongly swallow
              // events hours older than the session
              case Some(o) if t >= o.start - gapMicros && t <= o.end + gapMicros =>
                open = Some(Open(t min o.start, t max o.end, o.n + 1, o.sum + e.value))
              case Some(o) if t > o.end + gapMicros =>
                closed += o
                open = Some(Open(t, t, 1L, e.value))
              case Some(_) =>
                lateOpen match {
                  case Some(lo) if t >= lo.start - gapMicros && t <= lo.end + gapMicros =>
                    lateOpen = Some(Open(t min lo.start, t max lo.end, lo.n + 1, lo.sum + e.value))
                  case Some(lo) =>
                    closed += lo
                    lateOpen = Some(Open(t, t, 1L, e.value))
                  case None =>
                    lateOpen = Some(Open(t, t, 1L, e.value))
                }
              case None =>
                open = Some(Open(t, t, 1L, e.value))
            }
          }
          lateOpen.foreach(closed += _)
          if (state.hasTimedOut) {
            open.foreach(closed += _)
            open = None
            state.remove()
          } else {
            open.foreach { o =>
              state.update(o)
              // clamp to the current watermark: late events (which
              // flatMapGroupsWithState does NOT drop) would otherwise
              // request a timeout in the past and kill the query
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(o.end / 1000 + gapSeconds * 1000, wm + 1))
            }
          }
          closed.iterator.map(o => (user, o.start, o.end, o.n, o.sum))
      }
    out.toDF("user_id", "start_us", "end_us", "n_events", "value_sum")
      .select(
        col("user_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"), col("value_sum"))
  }

  /** Time-bounded stream-stream join: clicks attributed to a signup of
    * the same user within `horizon` before the click. In streaming, BOTH
    * sides carry watermarks and the join condition bounds event-time
    * distance, so state eviction is provable (the only way a
    * stream-stream join runs unbounded). The same plan runs as a batch
    * twin for the equivalence test.
    */
  def clickAttribution(clicks: DataFrame, signups: DataFrame,
                       horizon: String = "7 days"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val s = signups.select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    c.join(s,
      col("user_id") === col("s_user_id") &&
        col("click_ts") >= col("signup_ts") &&
        col("click_ts") <= col("signup_ts") + expr(s"INTERVAL $horizon"))
      .select(col("click_id"), col("user_id"), col("click_ts"), col("signup_ts"))
  }

  /** LEFT-OUTER variant of [[clickAttribution]]: unmatched clicks ARE
    * results — the "did not convert" rows every attribution report
    * needs alongside the conversions. `attributed` flags the outcome;
    * `signup_ts` is null on the outer rows.
    *
    * Streaming semantics are the interesting part: an outer row may
    * only emit once the engine can PROVE no future signup will match,
    * which happens when the watermark passes the click's join horizon
    * — so unmatched results trail the conversions by up to
    * (horizon + watermark delay) of event time, and rows still inside
    * that horizon when the stream idles remain in state, unemitted
    * (the standard outer-join tail contract; the batch twin reports
    * them immediately). State stays bounded exactly as in the inner
    * join: both sides' watermarks plus the time-bound condition give
    * provable eviction.
    */
  def clickAttributionOuter(clicks: DataFrame, signups: DataFrame,
                            horizon: String = "7 days"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val s = signups.select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
    c.join(s,
      col("user_id") === col("s_user_id") &&
        col("click_ts") >= col("signup_ts") &&
        col("click_ts") <= col("signup_ts") + expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"), col("signup_ts"),
        col("signup_ts").isNotNull.cast("int").as("attributed"))
  }

  /** Streaming CUSUM drift monitor — the per-day trajectory of
    * [[graft.ops.TimeSeries.cusumDaily]] computed AS EVENTS ARRIVE:
    * per key, open days accumulate integer-cent sums in state; when the
    * event-time WATERMARK passes a day's end the day is final, the
    * CUSUM recursion advances over it (in day order), and the closed
    * row emits exactly once. Targets are the stream-static calibration
    * table ([[graft.ops.TimeSeries.referenceTargets]] on warehouse
    * history) — broadcast-joined per micro-batch like every dimension.
    *
    * State per key is (scalars + open-day map) — bounded by the
    * watermark horizon in DAYS, evicted as days close; the grouping
    * shuffle keys on the monitored dimension. Late events for an
    * already-CLOSED day are dropped (the emitted row is immutable —
    * O(1) state cannot reopen history; size the watermark delay to the
    * pipeline's real disorder). Equivalence contract with the batch
    * twin: emitted rows equal `cusumDaily` restricted to days strictly
    * before the final watermark's day — spec-proven multi-batch with
    * `maxFilesPerTrigger = 1`.
    *
    * @return (key, day, a_cents, s_t, cusum, alarm) — closed days only
    */
  def cusumStream(
      spark: SparkSession,
      events: DataFrame,
      targets: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

    val prepped = events
      .where(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type").as("key"), col("ts"),
        coalesce((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)).as("cents"))
      .join(broadcast(targets.select(col("key"),
        col("target_cents").as("target"),
        col("threshold_cents").as("threshold"))), Seq("key"))
      .as[CusumEv]

    val out = prepped.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, (String, Long, Long, Long, Long, Int)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: String, evs: Iterator[CusumEv], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(
            CusumState(Long.MinValue, 0L, 0L, 0L, 0L, Map.empty))
          val open = scala.collection.mutable.Map[Long, Long]() ++ st.openDays
          evs.foreach { e =>
            st = st.copy(target = e.target, threshold = e.threshold)
            val day = Math.floorDiv(Math.floorDiv(e.ts.getTime, 1000L), 86400L)
            // a closed day is immutable — late arrivals beyond the
            // watermark drop here, by contract
            if (day > st.lastClosedDay)
              open(day) = open.getOrElse(day, 0L) + e.cents
          }
          // a day is final once the watermark passes its END
          val closeBefore =
            Math.floorDiv(Math.floorDiv(state.getCurrentWatermarkMs(), 1000L), 86400L)
          val closing = open.keys.filter(_ < closeBefore).toSeq.sorted
          val emitted = closing.map { day =>
            val a = open.remove(day).get
            val s = st.s + (a - st.target)
            val minS = math.min(st.minS, s)
            st = st.copy(lastClosedDay = day, s = s, minS = minS)
            val cusum = s - math.min(0L, minS)
            (key, day, a, s, cusum, if (cusum > st.threshold) 1 else 0)
          }
          if (state.hasTimedOut && open.isEmpty && emitted.isEmpty) {
            // nothing pending and nothing new — but the recursion's
            // scalars must survive for future days, so keep state
            state.update(st.copy(openDays = Map.empty))
          } else {
            state.update(st.copy(openDays = open.toMap))
          }
          if (open.nonEmpty) {
            // re-fire on any watermark advance so pending days close
            // even in a batch where this key receives no rows
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          }
          emitted.iterator
      }
    out.toDF("key", "day", "a_cents", "s_t", "cusum", "alarm")
  }

  /** Streaming Misra–Gries heavy hitters per key — the in-flight
    * frequent-items monitor (which sources/users dominate an ingest
    * RIGHT NOW, without waiting for the batch rollup). State per key is
    * k counters + one total, O(k) forever — the only way frequent-items
    * has bounded memory on an unbounded stream; the batch aggregate
    * twin is `misra_gries` ([[graft.functions.FreqSketch]]).
    *
    * Emission contract (Update mode): each micro-batch emits the key's
    * CURRENT summary — one row per tracked item with its lower-bound
    * estimate and the running total. Counter VALUES are arrival-order
    * dependent (inherent to MG — merges and sequences differ); what is
    * order-IMMUNE, and what the oracle gates, are the sketch
    * guarantees: every item with true count > n/(k+1) is present, and
    * every estimate e satisfies `true − ⌊n/(k+1)⌋ ≤ e ≤ true`. No
    * watermark is involved — frequency summaries have no event-time
    * horizon; state never expires (k longs per key).
    *
    * @param prepped columns (key: string, item: long)
    * @return streaming (key, item, est, n_total) — the per-batch
    *         snapshot; the FINAL snapshot per key is the row set at the
    *         key's max n_total
    */
  def heavyHittersStream(
      spark: SparkSession,
      prepped0: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val prepped = prepped0
      .select(col("key").cast("string").as("key"), col("item").cast("long").as("item"))
      .where(col("key").isNotNull && col("item").isNotNull)
      .as[MgEv]
    prepped.groupByKey(_.key)
      .flatMapGroupsWithState[MgState, (String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, evs: Iterator[MgEv], state: GroupState[MgState]) =>
          val st0 = state.getOption.getOrElse(MgState(0L, Map.empty))
          var n = st0.n
          val c = scala.collection.mutable.Map[Long, Long]() ++ st0.counters
          evs.foreach { e =>
            n += 1
            c.get(e.item) match {
              case Some(v) => c.update(e.item, v + 1)
              case None if c.size < k => c.update(e.item, 1L)
              case None =>
                // the MG step: decrement every counter (k+1 distinct
                // occurrences cancel), drop zeros
                val ks = c.keys.toArray
                var i = 0
                while (i < ks.length) {
                  val nv = c(ks(i)) - 1
                  if (nv == 0L) c.remove(ks(i)) else c.update(ks(i), nv)
                  i += 1
                }
            }
          }
          state.update(MgState(n, c.toMap))
          c.toSeq.map { case (item, est) => (key, item, est, n) }.iterator
      }.toDF("key", "item", "est", "n_total")
  }

  /** Streaming exact dedup on event id, state bounded by the watermark:
    * duplicates arriving within the watermark horizon are dropped, state
    * for ids older than the watermark is evicted (the only way streaming
    * dedup has bounded memory). The batch twin is `dropDuplicates`.
    */
  def streamingDedup(
      spark: SparkSession,
      path: String,
      watermark: String = "1 hour",
      idCols: Seq[String] = Seq("event_id")): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Batch twin of [[streamingDedup]]: earliest arrival per id wins
    * (`dropDuplicatesWithinWatermark` keeps the first-seen row; in a
    * batch replay of the same data, first-seen = smallest event time).
    * The extra `tieCols` give a total order when two arrivals share a
    * timestamp, which streaming resolves by arrival order — batch must
    * pin it explicitly to stay deterministic.
    *
    * Equivalence contract: the twin matches the streaming result iff
    * every duplicate pair lies within the watermark horizon of each
    * other — that is the only guarantee `dropDuplicatesWithinWatermark`
    * itself makes (state for an id is evicted once the watermark passes
    * it, so duplicates farther apart than the horizon are BOTH emitted
    * by streaming, while this global dedup keeps one). Size the
    * watermark to the maximum duplicate spread, not just arrival skew.
    */
  def dedupBatchTwin(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      tsCol: String = "ts",
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    val order = (col(tsCol).asc +: tieCols.map(col(_).asc))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCols.map(col): _*).orderBy(order: _*)
    events.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Micro-batch sink via foreachBatch, IDEMPOTENT under replay:
    * foreachBatch is at-least-once (a crash between the batch write and
    * the checkpoint commit redelivers the same micro-batch), so a plain
    * append would duplicate rows. Each batch lands in its own
    * `_batch_id` partition with dynamic partition overwrite — a
    * redelivered batch overwrites its previous partition instead of
    * appending a second copy. This is the hook for arbitrary batch-side
    * logic (MERGE-style upserts, multi-table fan-out) that the
    * declarative sinks can't express.
    *
    * `checkpoint` makes the run INCREMENTAL ACROSS INVOCATIONS: with a
    * persistent checkpoint location, a later run of the same query
    * processes only files that arrived since the previous run ended —
    * the "process today's crawl, not the whole corpus" mode every
    * recurring ingest needs. Without it Spark uses a throwaway
    * checkpoint and each invocation reprocesses everything. Returns the
    * terminated query so callers can audit `recentProgress` (e.g. that
    * an incremental run read exactly the new rows).
    */
  def runToTable(
      df: DataFrame,
      table: String,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer0 = df.writeStream
      .outputMode(OutputMode.Append())
    val writer = checkpoint.fold(writer0)(c => writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try {
          val tagged = batch.withColumn("_batch_id", lit(batchId))
          if (!spark.catalog.tableExists(table)) {
            // a crashed earlier run can leave an orphaned LOCATION with no
            // catalog entry; CREATE would refuse it
            graft.sources.Bucketing.clearStaleTable(spark, table)
            tagged.write.partitionBy("_batch_id").saveAsTable(table)
          } else {
            // positional insert: _batch_id was appended last, matching the
            // partition-column-last layout saveAsTable created
            tagged.write.mode("overwrite").insertInto(table)
            // a partition overwrite replaces files in place. This refresh
            // covers the micro-batch session; OTHER sessions (foreachBatch
            // runs in an isolated clone) that read the table before a
            // replay must REFRESH TABLE themselves or their cached file
            // listing hits FILE_NOT_EXIST — the standard contract for any
            // overwritten table.
            spark.catalog.refreshTable(table)
          }
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Run a COMPLETE-mode streaming aggregation to completion with the
    * result distributed-written per micro-batch: foreachBatch overwrites
    * a managed table with each trigger's full aggregation state, the
    * last trigger wins, and the returned DataFrame scans the table's
    * files. The memory sink alternative collects every result row into
    * DRIVER memory and re-ships it to executors as one giant
    * LocalTableScan task when consumed (a 100 MB task at 1M events,
    * growing linearly with the result) — this runner keeps the result on
    * executors end-to-end, so the streaming harness scales with the
    * cluster like every batch query. Complete mode re-emits the whole
    * state each trigger, so the per-batch overwrite is idempotent under
    * replay by construction.
    */
  def runToCompleteTable(spark: SparkSession, df: DataFrame, table: String): DataFrame = {
    val q = df.writeStream
      .outputMode(OutputMode.Complete())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        if (!s.catalog.tableExists(table)) {
          // a crashed earlier run can leave an orphaned LOCATION with no
          // catalog entry; CREATE would refuse it (same guard as the
          // Append runner above)
          graft.sources.Bucketing.clearStaleTable(s, table)
        }
        batch.write.mode("overwrite").saveAsTable(table)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // each overwrite replaces files in place; CALLER-session caches
    // (this runner may be rerun over an existing table) hold the old
    // file listing until refreshed
    spark.catalog.refreshTable(table)
    spark.table(table)
  }

  /** Run a streaming query to completion against bounded input via the
    * memory sink, returning the materialized result table. Used by tests
    * to prove streaming/batch equivalence on SMALL inputs; for anything
    * result-heavy use [[runToCompleteTable]] — the memory sink is
    * driver-resident by design.
    */
  def runToMemorySink(spark: SparkSession, df: DataFrame, name: String,
                      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

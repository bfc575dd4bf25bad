package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream, as a batch plan.
  *
  * Classic pattern: a new session starts when the gap to the previous
  * event of the same user exceeds `gapSeconds`; session ids are the
  * running count of session starts. Two window passes over the same
  * (user_id, ts) partitioning — Catalyst reuses the single sort+shuffle
  * for both, so the cost is one shuffle keyed by user (uniform, scalable).
  * The streaming twin of this operator lives in
  * [[graft.streaming.EventStreams]] (flatMapGroupsWithState).
  */
object Sessions {

  /** Assign a session sequence number per user. Output = input +
    * `session_seq` (1-based per user).
    */
  def assign(events: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
             tieBreak: Seq[String] = Nil): DataFrame = {
    val byUser = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc +: tieBreak.map(col(_).asc): _*)
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(byUser)
    val isStart = when(prev.isNull || micros - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(isStart).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered multi-step funnel: how many users reached step i of
    * `steps`, where step i must occur at-or-after the user's earliest
    * qualifying step i-1 event, and every step beyond the first must
    * fall within `horizonSeconds` of the user's FIRST step-0 event
    * (the anchor — the standard product-analytics funnel contract).
    *
    * Shape: one cumulative window per step over the SAME
    * (user, ts, tieBreak) ordering — "earliest step-i event seen so far
    * that had a completed step-(i-1) prefix" is a running `min(when)`,
    * so the chain needs no self-joins and no per-user event collection.
    * Catalyst plans all the step windows over one sort; the per-user
    * finalize reuses the same hash partitioning, so the whole funnel
    * costs ONE shuffle keyed by user no matter how many steps. The
    * closing count is a single-row aggregate unpivoted to one row per
    * step — funnels over billions of events reduce before anything
    * reaches the driver.
    *
    * Output: (step 1-based, step_name, n_users), one row per step;
    * n_users is monotonically non-increasing by construction.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], horizonSeconds: Long,
             tieBreak: Seq[String] = Nil): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val cum = Window.partitionBy(userCol)
      .orderBy(col(tsCol).asc +: tieBreak.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = unix_micros(col(tsCol))
    val staged = steps.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      // s{i}_ts = earliest step-i event whose user had completed steps
      // 0..i-1 by then; the running min over rows ≤ current makes the
      // in-order requirement implicit (s{i-1}_ts ≤ this row's ts).
      val qualifies =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(s"s${i - 1}_ts").isNotNull &&
          m <= col("s0_ts") + horizonSeconds * 1000000L
      df.withColumn(s"s${i}_ts", min(when(qualifies, m)).over(cum))
    }
    val finals = steps.indices.map(i => min(col(s"s${i}_ts")).as(s"s$i"))
    val perUser = staged.groupBy(col(userCol)).agg(finals.head, finals.tail: _*)
    val counts = steps.indices.map(i => count(col(s"s$i")).as(s"c$i"))
    perUser.agg(counts.head, counts.tail: _*)
      .select(explode(array(steps.zipWithIndex.map { case (st, i) =>
        struct(lit(i + 1).as("step"), lit(st).as("step_name"),
          col(s"c$i").as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
  }

  private val convFromSlot = new CacheSlot

  /** Conversion-latency report — how LONG the funnel takes, the number
    * [[funnel]]'s step counts can't give (two funnels with identical
    * conversion can differ 100× in time-to-convert; latency is what the
    * product decision reads). Per user: first `fromType` event, first
    * `toType` at-or-after it; the report is exact nearest-rank
    * p50/p90/p99 of the latency plus the conversion rate.
    *
    * Exactness: latencies are truncating integer seconds on epoch
    * micros; percentiles use the x15 histogram-rank formulation (value
    * whose cumulative range contains `r = ⌈p·n⌉`), conversion is
    * floored basis points — no floats anywhere.
    *
    * Scale shape: two user-keyed aggregates (the `fromType` anchor is
    * slot-cached — it feeds the join AND the denominator count); the
    * latency histogram is bounded by DISTINCT LATENCY SECONDS — at most
    * the observation window in seconds, regardless of user count — and
    * only that bounded relation enters the single-partition cumulative
    * window.
    *
    * @return one row: (n_from, n_conv, conv_bp, p50_s, p90_s, p99_s)
    */
  def conversionLatency(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      fromType: String,
      toType: String): DataFrame = {
    val m = unix_micros(col(tsCol))
    val anchors = convFromSlot.persist(
      events.where(col(typeCol) === fromType)
        .groupBy(col(userCol).as("u")).agg(min(m).as("t_from")))
    val conv = events.where(col(typeCol) === toType)
      .select(col(userCol).as("u"), m.as("t_to"))
      .join(anchors, Seq("u"))
      .where(col("t_to") >= col("t_from"))
      .groupBy("u")
      .agg(min(col("t_to")).as("t_to"), max(col("t_from")).as("t_from"))
      .withColumn("lat_s", expr("(t_to - t_from) div 1000000"))
    val vc = conv.groupBy("lat_s").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("lat_s")
    val nf = anchors.agg(count(lit(1)).as("n_from"))
    vc.withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
      .agg(max(col("n")).as("n_conv"),
        max(when(expr("(5000 * n + 9999) div 10000").between(col("lo"), col("hi")),
          col("lat_s"))).as("p50_s"),
        max(when(expr("(9000 * n + 9999) div 10000").between(col("lo"), col("hi")),
          col("lat_s"))).as("p90_s"),
        max(when(expr("(9900 * n + 9999) div 10000").between(col("lo"), col("hi")),
          col("lat_s"))).as("p99_s"))
      .crossJoin(broadcast(nf))
      .withColumn("conv_bp", expr("(10000 * n_conv) div n_from"))
      .select("n_from", "n_conv", "conv_bp", "p50_s", "p90_s", "p99_s")
  }

  /** Weekly cohort retention: users cohorted by the week of their FIRST
    * `anchorType` event (e.g. signup), then counted distinct per
    * (cohort week, whole-week offset) of any later activity — the
    * classic retention triangle. Offsets are truncating integer
    * division on epoch micros, cohort weeks are `date_trunc('week')`
    * (Monday-start in Spark and DuckDB alike), so every boundary is
    * exact integer arithmetic.
    *
    * Shape: the anchor pass is a user-keyed aggregate; the activity
    * join shuffles on the same user key (co-partitioned, AQE sizes it);
    * the closing count-distinct reduces to (weeks × offsets) rows —
    * nothing scales with raw event count past the first shuffle.
    * Activity BEFORE the anchor (negative offset) is excluded; users
    * with no anchor event never enter the cohort.
    *
    * Output: (cohort_week "yyyy-MM-dd", week_offset, n_active).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
                anchorType: String, maxWeeks: Int = 8): DataFrame = {
    val anchors = events.where(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("anchor_ts"))
    val m = unix_micros(col(tsCol))
    val m0 = unix_micros(col("anchor_ts"))
    events.join(anchors, Seq(userCol))
      // pre-anchor rows go BEFORE the division: `div` truncates toward
      // zero, so a negative µs gap would alias into offset 0
      .where(m >= m0)
      .withColumn("du", m - m0)
      .withColumn("week_offset", expr("cast(du div 604800000000 as int)"))
      .where(col("week_offset") <= maxWeeks)
      .groupBy(
        date_format(date_trunc("week", col("anchor_ts")), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Per-session aggregates: event count, optional value sum, bounds.
    * `valueCol = None` skips the sum (for tables without a value column).
    */
  def aggregate(events: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
                valueCol: Option[String] = Some("value")): DataFrame = {
    val base = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"))
    // exact decimal sum (engine convention): raw double sums are
    // accumulation-order-dependent and cannot hash-match an oracle
    val aggs = valueCol.map(v =>
      sum(col(v).cast("decimal(18,2)")).cast("double").as("session_value")).toSeq ++ base
    assign(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavioral fingerprint under bot detection (bot flows have
    * near-deterministic rows), next-event prediction baselines, and
    * funnel design. Each user's events order by (ts, tiebreak…); every
    * consecutive pair emits one (from_type, to_type) transition; counts
    * aggregate globally with the probability as FIXED-POINT basis points
    * `(n · 10000) div from_total` — integer floor division, so the
    * result is a pure function of the event set (no float ratio whose
    * last ulp could differ across engines).
    *
    * Scale shape: ONE shuffle on the user key for the lead() window —
    * sequences live per-user, so the window partitions by user and never
    * globally sorts — then the transition groupBy's map-side partial
    * collapses to ≤ |type|² rows per partition before the second
    * (trivially small) exchange. The per-type totals reuse the counted
    * matrix itself (a |type|²-row window), NOT a second pass over events.
    *
    * @param tieBreak extra ordering columns after ts (determinism when
    *                 one user has simultaneous events)
    * @return (from_type, to_type, n BIGINT, p_bp BIGINT) — `p_bp` the
    *         floored basis-point probability P(to | from)
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieBreak.map(col): _*)
    val pairs = events
      .select((Seq(col(userCol), col(tsCol), col(typeCol).as("from_type")) ++
        tieBreak.map(col)): _*)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val counted = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counted.select(col("from_type"), col("to_type"), col("n"),
      expr("(n * 10000) div sum(n) over (partition by from_type)").as("p_bp"))
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands engagement metric (DAU streaks, habit scoring,
    * retention-risk flags). Works on any integer "period index" (epoch
    * day here; weeks or months are a caller-side division away).
    *
    * The island identity: over a user's DISTINCT active days ordered
    * ascending, `day − row_number()` is constant exactly while days are
    * consecutive — each constant value names one streak. Every step is
    * integer arithmetic on the event-time epoch, so the result replays
    * exactly in any engine.
    *
    * Scale shape: ONE exchange on the user key; the distinct, both
    * window passes, and the two aggregates all reuse that partitioning
    * (the e23 sweep-line recipe). Output is users-sized; only per-user
    * counters cross the final aggregation.
    *
    * @param tsCol event-time column castable to TIMESTAMP; activity days
    *              are UTC calendar days of the epoch (`floor(epoch_us /
    *              86400e6)` — no session-timezone dependence)
    * @return (user, n_active_days, n_streaks, longest_streak,
    *          longest_streak_start_day) — start day ties broken to the
    *          EARLIEST streak of maximal length
    */
  /** RFM segmentation — the classic customer-value rollup (Recency /
    * Frequency / Monetary, quintile-scored): per user, days since last
    * event, event count, and exact-cent value sum, each scored 1–5
    * against the population's exact 20/40/60/80th-percentile cuts, and
    * concatenated into the familiar "RFM" segment code ("555" = best).
    *
    * Determinism design: metrics are integers (epoch days, counts,
    * DECIMAL-exact cents), and the quintile cuts are EXACT discrete
    * percentiles via the x15 formulation — value at rank
    * `(p_bp·n + 9999) div 10000` over the VALUE HISTOGRAM (never a
    * row_number over users) — so every cut is a well-defined population
    * value and every score a pure integer comparison. Scoring is
    * strictly-greater against the cuts (recency strictly-less: recent =
    * good), so ties at a cut land deterministically in the lower
    * bucket. The reference day is `max(day)` over the input — a
    * content-stable anchor both engines agree on.
    *
    * Scale shape: one user-keyed aggregate builds the metric relation;
    * each cut set is a histogram aggregate (distinct-values-sized, the
    * x15 scale fix) joined back as ONE one-row scalar row; scoring is a
    * row-local projection. Nothing user-sized crosses a window.
    *
    * @return (user, r_days, f_n, m_cents, r_score, f_score, m_score,
    *          segment)
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val dayExpr = expr(s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400""")
    val base = events.select(col(userCol).as("user"), dayExpr.as("day"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val refDay = base.agg(max(col("day")).as("ref_day"))
    val metrics = base.crossJoin(refDay).groupBy("user")
      .agg((max(col("ref_day")) - max(col("day"))).as("r_days"), // ref_day is constant
        count(lit(1)).as("f_n"), sum(col("cents")).as("m_cents"))
    // exact discrete quintile cuts over the metric HISTOGRAM (x15):
    // one row out per metric, joined back as a scalar. The cumulative
    // runs through the PARALLEL prefix sum, not an unpartitioned
    // window: the m_cents histogram is effectively user-sized (exact
    // cent sums are near-unique per user — the same "value-domain
    // bound" fallacy the x47 skyline fell for), so a single-task
    // cumulative here would serialize the population sweep at scale.
    def cuts(c: String): DataFrame = {
      val hist = metrics.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val cum = graft.ops.Stats.cumSumParallel(hist, "v", "cnt", "cum")
      val withN = cum.crossJoin(metrics.agg(count(lit(1)).as("n")))
      withN.agg(
        min(when(col("cum") >= expr("(2000 * n + 9999) div 10000"), col("v"))).as(s"${c}_t20"),
        min(when(col("cum") >= expr("(4000 * n + 9999) div 10000"), col("v"))).as(s"${c}_t40"),
        min(when(col("cum") >= expr("(6000 * n + 9999) div 10000"), col("v"))).as(s"${c}_t60"),
        min(when(col("cum") >= expr("(8000 * n + 9999) div 10000"), col("v"))).as(s"${c}_t80"))
    }
    def gtScore(v: Column, p: String) =
      (lit(1L) + (v > col(s"${p}_t20")).cast("long") + (v > col(s"${p}_t40")).cast("long")
        + (v > col(s"${p}_t60")).cast("long") + (v > col(s"${p}_t80")).cast("long"))
    // recency: LOWER is better — strictly-less against the cuts from the top
    def ltScore(v: Column, p: String) =
      (lit(1L) + (v < col(s"${p}_t80")).cast("long") + (v < col(s"${p}_t60")).cast("long")
        + (v < col(s"${p}_t40")).cast("long") + (v < col(s"${p}_t20")).cast("long"))
    metrics.crossJoin(cuts("r_days")).crossJoin(cuts("f_n")).crossJoin(cuts("m_cents"))
      .select(col("user"), col("r_days"), col("f_n"), col("m_cents"),
        ltScore(col("r_days"), "r_days").as("r_score"),
        gtScore(col("f_n"), "f_n").as("f_score"),
        gtScore(col("m_cents"), "m_cents").as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
  }

  /** Cohort lifetime value: users grouped by first-activity period, a
    * cell per (cohort, periods-since), revenue per cell, and the
    * running cumulative — the standard retention-revenue triangle
    * behind every LTV curve. `periodDays` sets the cohort granularity
    * (7 = weekly; calendar-month cohorts are the same plan with a
    * month index instead of the day quotient).
    *
    * Determinism: periods are integer indices — the e31 UTC epoch-day
    * (positive-mod floor, so pre-1970 timestamps floor instead of
    * truncating) floor-divided by `periodDays` with the same
    * positive-mod trick — revenue is DECIMAL-exact cents (the e33
    * recipe: doubles become cents ONCE through a decimal cast, sums
    * are long sums), and the cumulative window orders by
    * `age_periods`, which is DISTINCT within a cohort — a total order,
    * no tie ambiguity.
    *
    * Scale shape: one user-keyed aggregate derives cohorts, one
    * user-keyed join tags events (same key — the exchange is reused),
    * one (cohort, age)-keyed aggregate collapses to the triangle,
    * periods² rows at most; the cumulative window runs over THAT tiny
    * relation, never the events. countDistinct is Spark's two-phase
    * expand — no driver-side anything.
    *
    * @return (cohort_start "yyyy-MM-dd", age_periods, n_users,
    *          revenue_cents, cum_revenue_cents)
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val p = periodDays
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val base = events.select(col(userCol).as("user"),
      expr(s"""(($daySql) - ((($daySql) % $p + $p) % $p)) div $p""").as("m"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cohorts = base.groupBy("user").agg(min(col("m")).as("cohort_m"))
    val cells = base.join(cohorts, Seq("user"))
      .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("age_periods"))
      .agg(countDistinct(col("user")).as("n_users"),
        sum(col("cents")).as("revenue_cents"))
    val w = Window.partitionBy("cohort_m").orderBy("age_periods")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(w))
      .select(
        date_format(date_add(to_date(lit("1970-01-01")),
          (col("cohort_m") * p).cast("int")), "yyyy-MM-dd").as("cohort_start"),
        col("age_periods"), col("n_users"), col("revenue_cents"),
        col("cum_revenue_cents"))
  }

  /** Top event paths: each user's first `pathLen` events (by time, tie
    * broken on `tieCol` — pass a unique event id for a total order)
    * concatenated into a ">"-joined path, counted across users, top-N
    * paths returned — the "common journeys" / funnel-discovery query.
    *
    * Scale shape: ROW_NUMBER bounds every user to `pathLen` rows BEFORE
    * anything aggregates (never a per-user collect of the full history
    * — a power user with 10⁶ events contributes `pathLen` rows, not a
    * 10⁶-element array in one row); the groupBy-user assembly rides the
    * window's existing user partitioning (exchange reuse, one shuffle
    * end-to-end), and the top-N is TakeOrderedAndProject, never a
    * global sort.
    *
    * @return (path, n_users), ordered (n_users DESC, path ASC), ≤ topN
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, pathLen: Int, topN: Int): DataFrame = {
    require(pathLen >= 1 && topN >= 1, "pathLen and topN must be positive")
    val byUser = Window.partitionBy("user")
      .orderBy(col("ts").asc, col("tie").asc)
    val first = events
      .select(col(userCol).as("user"), col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("et"))
      .withColumn("rn", row_number().over(byUser))
      .where(col("rn") <= pathLen)
    val paths = first.groupBy("user")
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(rn, et))), x -> x.et)"),
        ">").as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topN)
  }

  def longestStreak(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("user"),
        // cast-to-long on a timestamp is whole seconds (floored), and
        // 86400 divides cleanly: day = floor(epoch_s / 86400) — but
        // pre-1970 rows would truncate toward zero, so use the portable
        // positive-mod floor there too
        expr(s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
                 ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
                 div 86400""").as("day"))
      .distinct()
    val byDay = Window.partitionBy(col("user")).orderBy(col("day"))
    val streaks = days
      .withColumn("island", col("day") - row_number().over(byDay))
      .groupBy(col("user"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    streaks.groupBy(col("user"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        // earliest start among maximal-length streaks: max of
        // (len, -start_day) picks len DESC then start_day ASC
        (-max(struct(col("len"), (-col("start_day")).as("neg_start")))
          .getField("neg_start")).as("longest_streak_start_day"))
  }

  /** The shared Kaplan–Meier daily-factor tree: `ln(1 − d/n)` in
    * micro-nats, one divide + one subtract + one ln + one round —
    * identical expression in the engine and the oracle (the t19
    * micro-nat contract), NULL when the cohort goes extinct (d ≥ n,
    * ln 0 undefined).
    */
  def kmFactorSql(churned: String, atRisk: String): String =
    s"""CASE WHEN $churned = 0 THEN CAST(0 AS BIGINT)
         WHEN $churned >= $atRisk THEN CAST(NULL AS BIGINT)
         ELSE CAST(ROUND(ln(1 - CAST($churned AS DOUBLE)
           / CAST($atRisk AS DOUBLE)) * 1000000) AS BIGINT) END"""

  /** Kaplan–Meier survival over user activity — the retention curve
    * done right (Kaplan & Meier 1958): a user "churns" on their LAST
    * active day; users still active on the observation window's final
    * day are RIGHT-CENSORED (they leave the at-risk set without
    * counting as churn — naive retention curves conflate the two and
    * under-report late survival). Per calendar day t:
    *
    *   S(t) = Π_{s ≤ t} (1 − d_s / n_s)
    *
    * reported in LOG space as exact cumulative micro-nat sums
    * (`Σ round(10⁶·ln(1−d/n))` — integer addition is order-immune
    * where the float product Π is not; consumers compare curves by
    * lognat directly, or exp() at the display boundary). When a day
    * consumes the whole at-risk set (d = n), survival hits exact zero
    * and every later day reports NULL (extinct), never a −∞ or NaN.
    *
    * Scale shape: one user-grain aggregate (first/last day), then
    * DELTA COUNTING — +1 at first_day, −1 at last_day+1 — so the
    * at-risk count is a running sum over the CALENDAR, never a
    * users × days explosion; churn counts ride the same user table.
    * The one unpartitioned window is calendar-bounded (the e34/e39
    * discipline).
    *
    * @return (day, n_at_risk, n_churned, factor_fp, surv_lognat_fp) —
    *         one row per calendar day in [min_day, max_day]
    */
  def kaplanMeier(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val ud = df.select(col(userCol).as("u"), expr(daySql).as("day"))
      .groupBy("u").agg(min(col("day")).as("first_day"),
        max(col("day")).as("last_day"))
    val span = ud.agg(min(col("first_day")).as("min_day"),
      max(col("last_day")).as("max_day"))
    val udc = ud.crossJoin(broadcast(span.select("max_day")))
    val deltas = udc.select(explode(array(
        struct(col("first_day").as("day"), lit(1L).as("delta")),
        struct((col("last_day") + 1).as("day"), lit(-1L).as("delta")))).as("x"))
      .select(col("x.day"), col("x.delta"))
      .groupBy("day").agg(sum(col("delta")).as("delta"))
    val churn = udc.where(col("last_day") < col("max_day"))
      .groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("n_churned"))
    val cal = span.select(explode(sequence(col("min_day"), col("max_day"))).as("day"))
    val ord = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(deltas, Seq("day"), "left").na.fill(0L, Seq("delta"))
      .join(churn, Seq("day"), "left").na.fill(0L, Seq("n_churned"))
      .withColumn("n_at_risk", sum(col("delta")).over(ord))
      .withColumn("factor_fp", expr(kmFactorSql("n_churned", "n_at_risk")))
      .withColumn("extinct", max(
        when(col("n_churned") >= col("n_at_risk") && col("n_churned") > 0, 1)
          .otherwise(0)).over(ord))
      .withColumn("surv_lognat_fp",
        when(col("extinct") === 1, lit(null).cast("long"))
          .otherwise(sum(col("factor_fp")).over(ord)))
      .select("day", "n_at_risk", "n_churned", "factor_fp", "surv_lognat_fp")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample irregular observations onto a
  * fixed time grid with gap filling — the step between raw event
  * streams and anything that assumes equally-spaced input (trend
  * dashboards, rate comparisons, forecasting features).
  *
  * [[resampleLocf]] buckets observations per key, spans each key's grid
  * from its first to its last bucket, and fills empty buckets with the
  * last observation carried forward (LOCF). Determinism: the per-bucket
  * aggregate is an exact DECIMAL sum cast back to double (never an
  * order-dependent double sum), and LOCF picks the unique previous
  * non-null bucket value — so the result is a pure function of the
  * input set, reproducible by any engine.
  *
  * Scale shape: the bucket aggregate and the LOCF window share the key
  * domain (two key-partitioned exchanges); the grid is `explode` over
  * `sequence(first, last, step)` — generated in-pipeline, no shuffle of
  * its own, and BOUNDED per key by the key's own active span, not the
  * corpus's. A key active for a year at hourly step contributes 8.8k
  * rows; pathological spans × fine steps are the caller's knob (coarsen
  * `step` or pre-split the key range). Nothing touches the driver.
  */
object TimeSeries {

  /** @param step a Spark interval literal, e.g. "1 hour" (must match
    *             the truncation unit `trunc`)
    * @param trunc `date_trunc` unit aligning buckets, e.g. "hour"
    * @return (key, bucket, v_filled, is_gap) — one row per grid bucket;
    *         `is_gap` marks buckets with no observation (LOCF-filled)
    */
  /** Rolling z-score anomaly detection — flag observations more than
    * `z` standard deviations from the mean of their key's previous `n`
    * observations (the classic online monitoring rule; trailing window
    * only, so the observation never smooths its own baseline).
    *
    * Exactness discipline: values become integer CENTS
    * (`decimal(18,2)·100`), the trailing sums S1=Σv, S2=Σv² are exact
    * integer window sums, and the test `(x−mean)² > z²·var` is cleared
    * of divisions by cross-multiplication into
    * `(n·x − S1)² > z²·(n·S2 − S1²)` — every comparison is on exact
    * longs, so any engine reproduces the flag set bit-for-bit (a float
    * stddev would put boundary observations on either side depending
    * on summation order). Observations with fewer than `n` predecessors
    * are never flagged (no small-sample baselines). Overflow bound:
    * |v| ≤ ~3·10⁶ cents at n ≤ 100 keeps z²·(n·S2 − S1²) under 2⁶³ —
    * fine for metric-like values; document-scale magnitudes should
    * coarsen the unit first.
    *
    * Ordering ties: the window orders by (`tsCol`, `idCol`) so
    * same-timestamp observations have a deterministic baseline.
    *
    * Scale shape: ONE key-partitioned exchange for the window; the
    * flag predicate is a projection. State is the n-row frame, bounded.
    *
    * @return flagged rows: (keyCol, idCol, tsCol, valueCol,
    *         baseline_n) — baseline_n always equals `n`, kept so
    *         downstream joins know the rule that fired
    */
  def anomalies(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      tsCol: String,
      valCol: String,
      n: Int = 20,
      z: Int = 3): DataFrame = {
    require(n >= 2, s"need a window of at least 2, got $n")
    require(z >= 1, s"z must be >= 1, got $z")
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast("long")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-n, -1)
    val flagged = df
      .withColumn("__v", cents)
      .withColumn("__s1", sum(col("__v")).over(w))
      .withColumn("__s2", sum(col("__v") * col("__v")).over(w))
      .withColumn("__cnt", count(lit(1)).over(w))
      .where(col("__cnt") === n)
      .where({
        val dev = lit(n.toLong) * col("__v") - col("__s1")
        dev * dev > lit(z.toLong * z) *
          (lit(n.toLong) * col("__s2") - col("__s1") * col("__s1"))
      })
    flagged.select(col(keyCol), col(idCol), col(tsCol), col(valCol),
      lit(n).as("baseline_n"))
  }

  def resampleLocf(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      step: String = "1 hour",
      trunc: String = "hour"): DataFrame = {
    val obs = df
      .groupBy(col(keyCol).as("key"), date_trunc(trunc, col(tsCol)).as("bucket"))
      .agg(sum(col(valCol).cast("decimal(18,2)")).cast("double").as("v"))
    val grid = obs.groupBy("key")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(col("key"),
        explode(expr(s"sequence(b0, b1, interval $step)")).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
    grid.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.as("is_gap"))
  }

  /** Per-key union of overlapping intervals — total covered time and
    * merged-island count (the uptime/coverage question: "how long was
    * this user/host/device active, counting overlaps once?").
    *
    * The island pass is the sweep-line classic as three windows over ONE
    * (key)-partitioned (start, end) sort: a row opens a new island iff
    * its start exceeds the running max of every earlier end (touching
    * intervals — start == previous end — merge, the closed-union
    * convention); a running sum of those flags numbers the islands; a
    * grouped (min start, max end) then collapses each island. Ties on
    * start cannot flip the result: any tied row after the first sees the
    * first's end (≥ its own start) in the running max, so only the
    * earliest row of a tie group can open an island — island COUNT and
    * extents are order-independent even though tie order is not.
    *
    * Scale shape: one exchange on the key; the three windows share one
    * sort, and both collapse aggregates reuse the partitioning. Bounds
    * stay integer µs end-to-end (`covered_us = Σ (island_end − island_
    * start)`), so any engine replays the result bit-for-bit.
    *
    * @param startCol/endCol epoch-µs LONG interval bounds, end exclusive
    * @return (key, n_islands, covered_us, span_us) — span_us is
    *         last end − first start (coverage ÷ span = duty cycle)
    */
  def intervalCoverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val ord = Window.partitionBy("key").orderBy("s", "e")
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol).as("key"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .withColumn("pme", max(col("e")).over(prev))
      .withColumn("ni", (col("pme").isNull || col("s") > col("pme")).cast("long"))
      .withColumn("island", sum(col("ni")).over(run))
      .groupBy("key", "island")
      .agg(min(col("s")).as("i_s"), max(col("e")).as("i_e"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_e") - col("i_s")).as("covered_us"),
        (max(col("i_e")) - min(col("i_s"))).as("span_us"))
  }

  /** Per-key OLS trend over integer (x, y) observations — the "is this
    * metric growing?" primitive (daily-volume trend per event type,
    * per-source crawl growth, per-tenant usage slope). Closed-form
    * simple linear regression, kept EXACT:
    *
    *   sxy = n·Σxy − Σx·Σy      (slope numerator)
    *   sxx = n·Σx² − (Σx)²      (slope denominator, ≥ 0; 0 ⇔ one
    *                             distinct x — slope undefined, NULL out)
    *
    * Both are integer expressions over map-side-partial integer sums —
    * no division, no doubles, immune to accumulation order — and the
    * reported `slope_micro = ⌊10⁶·sxy / sxx⌋` uses the PORTABLE floor
    * division `(a − ((a % b + b) % b)) div b`: bare integer division
    * TRUNCATES toward zero in BOTH Spark (`div`) and DuckDB (`//`) —
    * measured, not assumed (DuckDB 1.0: −417 // 46 = −9) — which is
    * not floor exactly when the numerator is negative, i.e. on every
    * downward trend. Both `%` operators are C-style, so the
    * positive-mod subtraction makes the operand exactly divisible and
    * truncation IS floor, in both engines.
    *
    * Caller contract (documented, not checked — the bound depends on
    * data the operator would have to scan): x should be SMALL integers
    * (offset from the series start, e.g. day index — the query layer
    * subtracts min(x) before calling); with |x| ≤ X and |y| ≤ Y the
    * exactness bound is n·X·(10⁶·n·Y) < 2⁶³ — day-grain series with
    * million-scale daily counts stay exact for ~10⁴ days.
    *
    * Scale shape: ONE hash aggregate on the key (5 integer partials),
    * then a row-local projection. Key cardinality is the output size;
    * nothing else leaves the executors.
    *
    * @return (key, n_points, sxy, sxx, slope_micro) — slope_micro NULL
    *         when all x coincide
    */
  def olsTrend(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_points"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy_raw"), sum(x * x).as("sxx_raw"))
      .select(col("key"), col("n_points"),
        (col("n_points") * col("sxy_raw") - col("sx") * col("sy")).as("sxy"),
        (col("n_points") * col("sxx_raw") - col("sx") * col("sx")).as("sxx"))
    // `a div b` truncates toward zero, but here it floors: the positive
    // mod makes (num − pm) exactly divisible by sxx, so truncation and
    // floor coincide and the LONG result is exact (no double quotient —
    // Spark's `/` on longs is a double divide, unsafe past 2^53)
    agg.withColumn("slope_micro", expr(
      """CASE WHEN sxx = 0 THEN CAST(NULL AS BIGINT) ELSE
           (sxy * 1000000L -
            ((sxy * 1000000L % sxx + sxx) % sxx)) div sxx END"""))
  }

  /** Theil–Sen robust trend (Theil 1950; Sen 1968) — the median of all
    * pairwise slopes per key. The robust complement of [[olsTrend]]:
    * OLS moves with every outlier (one corrupted ingest day bends the
    * fitted line); the pairwise-slope median has a 29.3% breakdown
    * point, which is why monitoring pipelines prefer it for "is this
    * source actually trending down" questions over dirty dailies.
    *
    * Determinism: each pair's slope is floored micro-units via the
    * positive-mod subtraction (`div`/`//` TRUNCATE in both engines —
    * not floor on negative slopes; the subtraction makes them agree),
    * and the median is the exact lower nearest-rank over the slope
    * histogram (the x15 discipline) — never a float percentile. Pairs
    * with equal x are skipped (vertical slope — the standard rule).
    *
    * Scale shape: the pair join is per-key O(n²/2) where n is the
    * SERIES length (days per key), not the row count — the daily
    * aggregate upstream bounds it (a year of dailies is ~66k pairs per
    * key); everything shuffles on the key only. For per-key series
    * beyond ~10⁴ points, thin the series first (weekly buckets) —
    * quadratic pair growth is inherent to the estimator.
    *
    * @return (key, n_pairs, ts_slope_micro) — a key with fewer than 2
    *         distinct x has no pairs and is absent from the output
    */
  def theilSenTrend(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    // both sides of the pair self-join re-derive the (usually
    // event-scan-backed) series without the slot — the e39/v22
    // multi-consumer lesson; the series itself is calendar-tiny
    val pts = trendPtsSlot.persist(
      df.select(col(keyCol).as("key"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    val pairs = pts
      .join(pts.select(col("key"), col("x").as("x2"), col("y").as("y2")), Seq("key"))
      .where(col("x2") > col("x"))
      .select(col("key"), expr(
        """((y2 - y) * 1000000L -
           |(((y2 - y) * 1000000L % (x2 - x) + (x2 - x)) % (x2 - x)))
           |div (x2 - x)""".stripMargin.replace("\n", " ")).as("slope"))
    val hist = pairs.groupBy("key", "slope").agg(count(lit(1)).as("c"))
    val ord = Window.partitionBy("key").orderBy("slope")
    hist
      .withColumn("hi", sum(col("c")).over(ord))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(Window.partitionBy("key")))
      .groupBy("key")
      .agg(max(col("n")).as("n_pairs"),
        max(when(expr("(n + 1) div 2").between(col("lo"), col("hi")),
          col("slope"))).as("ts_slope_micro"))
  }

  /** Seasonal-naive forecast backtest: forecast each (key, day)'s
    * value with the value one season earlier (`f(d) = a(d − season)`),
    * then score the forecast over the overlap — the baseline every
    * real forecasting system must beat, and the cheapest useful
    * backtest at warehouse scale (one self-join, two aggregates; no
    * model state).
    *
    * Metrics are exact integers: per-key MAE in floored cents
    * (`Σ|a−f| div n`) and WMAPE in floored basis points
    * (`10⁴·Σ|a−f| div Σa` — the WEIGHTED form: a per-day MAPE mean
    * explodes on near-zero days and needs a float mean; the weighted
    * ratio is one long division). Days with no prior-season actual
    * are excluded (a backtest scores only days a forecast exists for).
    *
    * Shape: one (key, day)-aggregate builds the daily series, one
    * equi-join on (key, day − season) aligns forecasts — same key
    * partitioning both sides, AQE-sized — and one key-aggregate
    * collapses to per-key scores. Nothing wider than the daily series
    * ever shuffles.
    *
    * @return (key, n_days, sum_actual_cents, sum_abs_err_cents,
    *          mae_cents, wmape_bp) — wmape_bp NULL when Σa = 0
    */
  def seasonalNaiveBacktest(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      seasonDays: Int = 7): DataFrame = {
    require(seasonDays >= 1, s"seasonDays must be >= 1, got $seasonDays")
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val daily = df.select(col(keyCol).as("key"), expr(daySql).as("day"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("key", "day").agg(sum(col("cents")).as("a"))
    val actual = daily.select(col("key"), col("day"), col("a"))
    val fc = daily.select(col("key"), (col("day") + seasonDays).as("day"),
      col("a").as("f"))
    actual.join(fc, Seq("key", "day"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sum(col("a")).as("sum_actual_cents"),
        sum(abs(col("a") - col("f"))).as("sum_abs_err_cents"))
      .withColumn("mae_cents", expr("sum_abs_err_cents div n_days"))
      .withColumn("wmape_bp", expr(
        """CASE WHEN sum_actual_cents > 0
             THEN (10000L * sum_abs_err_cents) div sum_actual_cents
             ELSE CAST(NULL AS BIGINT) END"""))
  }

  /** Per-key lag autocorrelation over the daily series — the
    * seasonality detector (WHICH season should e38's seasonal-naive
    * use? does this metric have a weekly cycle at all?). For each
    * requested lag L, the Pearson correlation of (x_t, x_{t−L}) over
    * all aligned day pairs — the pairwise-complete sample ACF (robust
    * to gaps in the series: only days with a lagged partner score).
    *
    * Determinism is the x35/g11 recipe: values integerize to exact
    * cents once, every 1st/2nd-order moment is an exact decimal sum,
    * and the ratio is the ONE shared closed-form IEEE tree
    * ([[Stats.corrSql]]) both engines evaluate bit-for-bit.
    * Constant-valued (zero-variance) windows → NULL, never NaN.
    *
    * Scale shape: one (key, day) aggregate builds the daily series
    * once; each requested lag replicates it via an array-literal
    * explode (|lags| is a handful — the replication is on the
    * CALENDAR-sized daily table, never the events); the lag align is
    * one key-partitioned self-join and the moments collapse with
    * map-side partials. A (key, lag) with no aligned pairs emits no
    * row.
    *
    * @return (key, lag, n_pairs, acf) — acf rounded to 6dp
    */
  def autocorrelation(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    require(lags.forall(_ >= 1), s"lags must be >= 1, got $lags")
    require(lags.distinct.size == lags.size, s"duplicate lags in $lags")
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val daily = df.select(col(keyCol).as("key"), expr(daySql).as("day"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("key", "day").agg(sum(col("cents")).as("a"))
    val shifted = daily
      .select(col("key"),
        explode(array(lags.map(l => lit(l.toLong)): _*)).as("lag"),
        (col("day") + col("lag")).as("day"), col("a").as("b"))
    daily.join(shifted, Seq("key", "day"))
      .select(col("key"), col("lag"),
        col("a").cast("decimal(19,0)").as("x"),
        col("b").cast("decimal(19,0)").as("y"))
      .groupBy("key", "lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("s_x"), sum(col("y")).as("s_y"),
        sum(col("x") * col("x")).as("s_xx"),
        sum(col("x") * col("y")).as("s_xy"),
        sum(col("y") * col("y")).as("s_yy"))
      .select(col("key"), col("lag"), col("n").cast("long").as("n_pairs"),
        expr(Stats.corrSql("s_xy", "s_x", "s_y", "s_xx", "s_yy")).as("acf"))
  }

  /** CUSUM changepoint detection over per-key daily series — "did this
    * metric's level shift, and when?" (traffic-mix drift, crawl-source
    * degradation, a pipeline stage silently doubling its output). The
    * one-sided upward CUSUM with target μ and alarm threshold h:
    *
    *   C_t = max(0, C_{t−1} + (x_t − μ)),   alarm when C_t > h
    *
    * The recursion looks stateful, but the classic prefix-sum identity
    * makes it two windows over ONE key-partitioned sort: with
    * S_t = Σ_{s≤t}(x_s − μ) and S_0 = 0,
    *
    *   C_t = S_t − min(0, min_{s≤t} S_s)
    *
    * so the running sum and a clamped running min replay the recursion
    * exactly — no iterative state, no UDF, no driver loop.
    *
    * Exactness discipline: daily values are integer cents; the target is
    * the per-key FLOORED mean daily value (`Σa div n`, positive-mod floor
    * so negative revenue days floor portably) and the threshold is
    * `alarmPctOfMean`% of that mean (scale-free — the same query works at
    * any SF) — so x−μ, S, min-S, and C are all exact longs and any engine
    * replays the alarm set bit-for-bit. A float mean would put
    * near-threshold days on either side depending on summation order.
    *
    * Scale shape: one (key, day) aggregate builds the daily series,
    * then EVERYTHING — μ/h (whole-partition window aggregates), the
    * running sum, the clamped running min, and the final per-key
    * collapse — rides ONE key-partitioned sort. (A separate key-grain
    * aggregate joined back would re-plan a SECOND full scan of the
    * events: Spark does not common-subexpression the DataFrame DAG —
    * caught by the plan audit.) Window state is the key's day count,
    * bounded by the calendar, never the event count.
    *
    * @param alarmPctOfMean alarm threshold as a percentage of the mean
    *                       daily value (e.g. 50 → alarm once cumulative
    *                       excess exceeds half a typical day)
    * @return (key, n_days, target_cents, threshold_cents, max_cusum,
    *          n_alarm_days, first_alarm_day) — first_alarm_day is an
    *          epoch-day LONG, NULL when the CUSUM never crosses
    */
  def cusumChangepoints(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      alarmPctOfMean: Int = 50): DataFrame = {
    require(alarmPctOfMean >= 1, s"alarmPctOfMean must be >= 1, got $alarmPctOfMean")
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val daily = df.select(col(keyCol).as("key"), expr(daySql).as("day"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("key", "day").agg(sum(col("cents")).as("a"))
    val ord = Window.partitionBy("key").orderBy("day")
    val all = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // floored mean target and percentage threshold (positive-mod floor:
    // Spark's `div` truncates, the subtraction makes it exact division),
    // as whole-partition WINDOW aggregates so they share the one sort
    daily
      .withColumn("n_days", count(lit(1)).over(all))
      .withColumn("sa", sum(col("a")).over(all))
      .withColumn("target_cents",
        expr("(sa - ((sa % n_days + n_days) % n_days)) div n_days"))
      .withColumn("threshold_cents", expr(
        s"""(target_cents * $alarmPctOfMean -
             ((target_cents * $alarmPctOfMean % 100 + 100) % 100)) div 100"""))
      .withColumn("s_t", sum(col("a") - col("target_cents")).over(run))
      .withColumn("cusum", col("s_t") - least(lit(0L), min(col("s_t")).over(run)))
      .groupBy("key")
      .agg(max(col("n_days")).as("n_days"),
        max(col("target_cents")).as("target_cents"),
        max(col("threshold_cents")).as("threshold_cents"),
        max(col("cusum")).as("max_cusum"),
        count(when(col("cusum") > col("threshold_cents"), 1)).as("n_alarm_days"),
        min(when(col("cusum") > col("threshold_cents"), col("day")))
          .as("first_alarm_day"))
  }

  private val dailySlot = new CacheSlot

  /** Shared by [[theilSenTrend]] and [[mannKendall]]: the per-key
    * series feeds a pair self-join (twice) and a tie/assembly branch —
    * slot-cached so the upstream (usually a full event scan) runs once.
    */
  private val trendPtsSlot = new CacheSlot

  /** The (key, day, a_cents) daily series shared by the monitoring
    * tier — PERSISTED through a slot, because a monitor composition
    * (reference targets + trajectory, several detectors over one
    * metric) consumes it from several branches and Spark re-plans the
    * full event scan per branch otherwise (the e39/v22 plan-audit
    * lesson). The artifact is calendar × keys sized.
    */
  def dailySeries(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    dailySlot.persist(
      df.select(col(keyCol).as("key"), expr(daySql).as("day"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .groupBy("key", "day").agg(sum(col("cents")).as("a_cents")))
  }

  /** In-control reference targets for the CUSUM monitor: per key, the
    * FLOORED mean daily value over the key's first `referenceDays`
    * observed days, and an alarm threshold at `alarmPctOfMean`% of it —
    * the "calibrate on a training window, monitor the rest" deployment
    * shape (the full-series μ of [[cusumChangepoints]] is the
    * retrospective variant). All floors are positive-mod (portable).
    *
    * @return (key, n_ref_days, target_cents, threshold_cents)
    */
  def referenceTargets(
      daily: DataFrame,
      referenceDays: Int = 14,
      alarmPctOfMean: Int = 50): DataFrame = {
    require(referenceDays >= 1, s"referenceDays must be >= 1, got $referenceDays")
    require(alarmPctOfMean >= 1, s"alarmPctOfMean must be >= 1, got $alarmPctOfMean")
    val w = Window.partitionBy("key")
    daily.withColumn("first_day", min(col("day")).over(w))
      .where(col("day") < col("first_day") + referenceDays)
      .groupBy("key")
      .agg(count(lit(1)).as("n_ref_days"), sum(col("a_cents")).as("sa"))
      .select(col("key"), col("n_ref_days"),
        expr("(sa - ((sa % n_ref_days + n_ref_days) % n_ref_days)) div n_ref_days")
          .as("target_cents"))
      .withColumn("threshold_cents", expr(
        s"""(target_cents * $alarmPctOfMean -
             ((target_cents * $alarmPctOfMean % 100 + 100) % 100)) div 100"""))
  }

  /** Per-day CUSUM trajectory against CALLER-SUPPLIED targets — the
    * deployable form of [[cusumChangepoints]] (which derives μ from the
    * full series and reports one summary row per key): in production
    * the target comes from an in-control REFERENCE period
    * ([[referenceTargets]]), and the monitor emits the full
    * (day, C_t, alarm) trajectory so drift is visible as it develops.
    * This is also the batch twin of the streaming monitor
    * ([[graft.streaming.EventStreams.cusumStream]]) — same targets in,
    * same per-day rows out.
    *
    * Same machinery as [[cusumChangepoints]]: the prefix-sum identity
    * over one key-partitioned sort, exact longs throughout. Keys
    * without a target drop (no μ — no monitor).
    *
    * @param daily the [[dailySeries]] table (key, day, a_cents)
    * @return (key, day, a_cents, s_t, cusum, alarm) per observed day
    */
  def cusumDaily(daily: DataFrame, targets: DataFrame): DataFrame = {
    val ord = Window.partitionBy("key").orderBy("day")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(targets.select(col("key"), col("target_cents"),
        col("threshold_cents")), Seq("key"))
      .withColumn("s_t", sum(col("a_cents") - col("target_cents")).over(run))
      .withColumn("cusum", col("s_t") - least(lit(0L), min(col("s_t")).over(run)))
      .withColumn("alarm",
        (col("cusum") > col("threshold_cents")).cast("int"))
      .select("key", "day", "a_cents", "s_t", "cusum", "alarm")
  }

  /** Recency-weighted value scoring with DYADIC half-life decay: each
    * observation contributes `value · 2^-(age_days div halfLifeDays)` —
    * the freshness-weighted engagement/quality feature (recent activity
    * dominates, stale activity fades geometrically).
    *
    * The decay is a STAIRCASE: weight halves once per FULL half-life
    * elapsed, implemented as `(cents · 1e6) div (1 << steps)` — a pure
    * long shift-and-divide, so every term is an exact integer and the
    * per-key sum is order-immune in any engine. The textbook smooth
    * `2^(-age/h)` needs a fractional `pow` whose libm rounding differs
    * across engines — the staircase trades within-half-life resolution
    * for bit-for-bit determinism (same trade as t19's micro-nats), and
    * preserves the ranking property that matters: strictly newer
    * half-life cohorts strictly dominate older ones. Steps cap at 62
    * (a long's shiftable range; anything ≥ 62 half-lives old scores 0
    * micro-units anyway).
    *
    * The reference day is `max(day)` over the input — the content-
    * stable anchor (e33's recipe), crossed in as ONE broadcast scalar
    * row. Shape: one projection, one key-partitioned aggregate.
    *
    * @return (key, n_events, total_cents, decayed_fp) — decayed value
    *         in micro-cent units
    */
  def decayScore(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val daySql = s"""(CAST(CAST($tsCol AS TIMESTAMP) AS LONG) -
      ((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) % 86400 + 86400) % 86400))
      div 86400"""
    val base = df.select(col(keyCol).as("key"),
      expr(daySql).as("day"),
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val ref = base.agg(max(col("day")).as("ref_day"))
    base.crossJoin(broadcast(ref))
      .withColumn("pow2", expr(
        s"""shiftleft(CAST(1 AS BIGINT),
              CAST(least((ref_day - day) div $halfLifeDays, 62L) AS INT))"""))
      // floored division via the positive-mod subtraction (olsTrend's
      // portability trick): both Spark's `div` and DuckDB's `//`
      // TRUNCATE, so the oracle needs the same subtraction — with it,
      // negative values (refunds) floor identically in both engines
      .withColumn("term_fp", expr(
        """((cents * 1000000L) -
            (((cents * 1000000L) % pow2 + pow2) % pow2)) div pow2"""))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(col("cents")).as("total_cents"),
        sum(col("term_fp")).as("decayed_fp"))
  }

  /** The z-statistic tree shared verbatim by the engine and the DuckDB
    * oracle (the corrSql contract): one exact int→double cast each for
    * the continuity-corrected S and the 18·Var(S) integer, one divide
    * by 18, one sqrt, one divide, one ×10⁶, one round — every step a
    * correctly-rounded IEEE op, so both engines reproduce the bits. */
  def mkZSql(sAdj: String, var18: String): String =
    s"""CAST(ROUND(CAST($sAdj AS DOUBLE) /
       |SQRT(CAST($var18 AS DOUBLE) / CAST(18 AS DOUBLE)) *
       |1000000) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** Mann–Kendall trend test (Mann 1945, Kendall 1975): the
    * SIGNIFICANCE companion to [[theilSenTrend]]'s slope — "is this
    * series trending at all, or is the slope noise?" — the question a
    * monitoring deployment asks before acting on a trend estimate.
    * Distribution-free: S = Σ_{i<j} sgn(y_j − y_i) depends only on the
    * ORDER of the values, so a few wild outliers move S by at most
    * their pair count, not their magnitude (the same robustness that
    * motivates Theil–Sen over OLS).
    *
    * Exactness: S and the tie-corrected 18·Var(S) =
    * n(n−1)(2n+5) − Σ_j t_j(t_j−1)(2t_j+5) are pure integers (ties
    * contribute no information and are subtracted from the variance —
    * Kendall's correction); the normal-approximation z with continuity
    * correction (S∓1) goes through the shared [[mkZSql]] IEEE tree so
    * the micro-unit z replays bit-for-bit in the oracle. |z| > 1.96 is
    * the caller's 5% two-sided gate. A single-point or all-tied series
    * has Var(S) = 0 → z is NULL, never a division blow-up.
    *
    * Scale shape: the input is a per-key DAILY series, so the pairwise
    * sign join is days²-per-key — CALENDAR-bounded (a decade of daily
    * points is ~6.7M pairs per key), independent of raw event volume,
    * the same bound [[theilSenTrend]] and e41's lag table rely on.
    * Everything shuffles on the key alone: the pair join, the
    * tie histogram, and the final assembly share one key domain.
    *
    * @param df per-key series: one row per (key, x, y), x unique per key
    * @return (key, n_points, s_stat, var18, z_micro) — var18 = 18·Var(S);
    *         z_micro NULL when var18 = 0
    */
  /** Index of dispersion (variance-to-mean ratio) of per-key daily
    * event counts — the burstiness gate: a Poisson-like steady source
    * reads ~1e6 micro-units, clumped/bursty traffic reads ≫ 1e6, and a
    * metronomic (scheduled) source reads ≪ 1e6. The cheap one-number
    * triage BEFORE paying for e39's full CUSUM trajectory.
    *
    * Exactness: days with zero events belong in the variance (that is
    * what burstiness means), so the day count is the full GLOBAL
    * calendar span — a one-row scalar — and zero days contribute
    * nothing to Σy or Σy², making the closed form all-integer over the
    * observed histogram alone: `D = (n·Σy² − S²) / (n·S)` in floored
    * micro-units (numerator ≥ 0 by Cauchy–Schwarz; population
    * variance, no Bessel — document, don't mix conventions). Decimal
    * products keep 10⁹-row keys exact.
    *
    * Scale shape: one (key, day) count aggregate, one key-grain rollup
    * of the tiny daily relation, one scalar cross join for the span.
    *
    * @return (key, n_days — global span, n_events, dispersion_micro)
    */
  def dispersionIndex(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val days = df.select(col(keyCol).as("key"),
      expr(s"CAST(CAST($tsCol AS TIMESTAMP) AS LONG) div 86400").as("day"))
    val span = days.agg(
      (max(col("day")) - min(col("day")) + 1).as("n_days"))
    val daily = days.groupBy("key", "day").agg(count(lit(1)).as("y"))
    daily.groupBy("key")
      .agg(sum(col("y")).as("s"),
        sum(col("y").cast("decimal(19,0)") * col("y")).as("ssq"))
      .crossJoin(span)
      .withColumn("num",
        col("n_days").cast("decimal(19,0)") * col("ssq")
          - col("s").cast("decimal(19,0)") * col("s"))
      .withColumn("den", col("n_days").cast("decimal(19,0)") * col("s"))
      .withColumn("dispersion_micro", expr(
        "CAST((num * 1000000) div den AS BIGINT)"))
      .select(col("key"), col("n_days"), col("s").as("n_events"),
        col("dispersion_micro"))
  }

  /** Day-of-week seasonality profile per key — the calendar-shape
    * fingerprint (which weekday peaks, how uneven the week is) that
    * decides e38's season and explains e49's deseasonalization. The
    * weekday index is PORTABLE integer arithmetic — `(epoch_day + 4) %
    * 7` with 0 = Sunday (engine-native day-of-week functions disagree
    * on numbering: Spark 1=Sunday..7, DuckDB 0=Sunday..6) — so the
    * profile replays bit-for-bit. Peak = max count, ties → smaller
    * index. One (key, dow) aggregate; ≤7 rows per key leave the scan.
    *
    * @return (key, dow — 0=Sunday, n, share_bp, is_peak)
    */
  def dayOfWeekProfile(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val counts = df.select(col(keyCol).as("key"),
        expr(s"((CAST(CAST($tsCol AS TIMESTAMP) AS LONG) div 86400) + 4) % 7")
          .as("dow"))
      .groupBy("key", "dow").agg(count(lit(1)).as("n"))
    counts
      .withColumn("tot",
        sum(col("n")).over(Window.partitionBy("key")))
      .withColumn("peak",
        min(struct((-col("n")).as("nn"), col("dow").as("dow")))
          .over(Window.partitionBy("key")))
      .select(col("key"), col("dow"), col("n"),
        expr("(10000 * n) div tot").as("share_bp"),
        (col("dow") === col("peak.dow")).cast("int").as("is_peak"))
  }

  def mannKendall(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    // pair join (both sides) + tie histogram = three consumers of the
    // series derivation without the slot
    val pts = trendPtsSlot.persist(
      df.select(col(keyCol).as("key"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    val pairs = pts
      .join(pts.select(col("key"), col("x").as("x2"), col("y").as("y2")), Seq("key"))
      .where(col("x2") > col("x"))
      .select(col("key"), expr(
        "CASE WHEN y2 > y THEN 1L WHEN y2 < y THEN -1L ELSE 0L END").as("sgn"))
    val s = pairs.groupBy("key").agg(sum(col("sgn")).as("s_stat"))
    val ties = pts.groupBy("key", "y").agg(count(lit(1)).as("c"))
      .groupBy("key")
      .agg(sum(col("c")).as("n_points"),
        sum(expr("c * (c - 1) * (2 * c + 5)")).as("tsum"))
    // left from the tie side: a single-point key has no pairs (S = 0 by
    // convention, variance 0) and must still report, not vanish
    ties.join(s, Seq("key"), "left")
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var18",
        expr("n_points * (n_points - 1) * (2 * n_points + 5) - tsum"))
      .withColumn("s_adj", expr(
        "CASE WHEN s_stat > 0 THEN s_stat - 1 WHEN s_stat < 0 THEN s_stat + 1 ELSE 0L END"))
      .withColumn("z_micro",
        when(col("var18") > 0, expr(mkZSql("s_adj", "var18"))))
      .select("key", "n_points", "s_stat", "var18", "z_micro")
  }
}

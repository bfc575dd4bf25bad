package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleLocf: grid spans per key, gaps carry forward, sums are exact") {
    val df = Seq(
      // user 1: obs at 00 (two rows, 0.1+0.2 must sum exactly) and 03
      (1L, ts("2024-01-01 00:10:00"), 0.1),
      (1L, ts("2024-01-01 00:40:00"), 0.2),
      (1L, ts("2024-01-01 03:05:00"), 5.0),
      // user 2: single observation -> one-bucket grid, no gaps
      (2L, ts("2024-01-02 10:30:00"), 7.5)
    ).toDF("user_id", "t", "value")
    val out = TimeSeries.resampleLocf(df, "user_id", "t", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00.0", 0.3, false), // exact: decimal, not 0.30000000000000004
      (1L, "2024-01-01 01:00:00.0", 0.3, true),
      (1L, "2024-01-01 02:00:00.0", 0.3, true),
      (1L, "2024-01-01 03:00:00.0", 5.0, false),
      (2L, "2024-01-02 10:00:00.0", 7.5, false)), out.mkString("\n"))
  }

  test("resampleLocf: daily step follows the trunc unit") {
    val df = Seq(
      (1L, ts("2024-03-01 23:00:00"), 1.0),
      (1L, ts("2024-03-04 01:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleLocf(df, "k", "t", "v", step = "1 day", trunc = "day")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      ("2024-03-01 00:00:00.0", 1.0, false),
      ("2024-03-02 00:00:00.0", 1.0, true),
      ("2024-03-03 00:00:00.0", 1.0, true),
      ("2024-03-04 00:00:00.0", 2.0, false)), out.mkString("\n"))
  }

  test("anomalies: 3-sigma boundary is exact; short baselines never flag") {
    // alternating 100.00/102.00 for 20 obs: mean 101.00, sigma exactly
    // 1.00 -> the 3-sigma bar sits at 104.00/98.00
    def obs(i: Int, v: Double) = ("m1", i.toLong, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), v)
    val base = (0 until 20).map(i => obs(i, if (i % 2 == 0) 100.00 else 102.00))
    // each candidate sees the SAME clean 20-obs baseline (appending them
    // to one series would put earlier candidates inside later windows)
    def flags(v: Double): Seq[Long] =
      TimeSeries.anomalies((base :+ obs(20, v)).toDF("key", "id", "t", "v"),
        "key", "id", "t", "v", n = 20, z = 3)
        .collect().map(_.getLong(1)).sorted.toSeq
    assert(flags(104.00) == Nil)        // dev == 3 sigma exactly: strict >
    assert(flags(104.01) == Seq(20L))   // one cent past the bar
    assert(flags(97.99) == Seq(20L))    // ...and on the low side
    assert(flags(1000.00) == Seq(20L))  // unambiguous spike
    val rows = base :+ obs(20, 1000.00)
    // under n predecessors: even a wild value is never flagged
    val shortDf = (0 until 5).map(i => obs(i, 1.00)).toDF("key", "id", "t", "v")
    assert(TimeSeries.anomalies(shortDf, "key", "id", "t", "v").isEmpty)
    // keys are independent baselines: the same spike on a fresh key is silent
    val twoKeys = (rows.map { case (_, i, t, v) => ("a", i, t, v) } :+
      ("b", 99L, ts("2024-01-01 09:00:00"), 1000.00)).toDF("key", "id", "t", "v")
    val flaggedKeys = TimeSeries.anomalies(twoKeys, "key", "id", "t", "v")
      .collect().map(_.getString(0)).toSet
    assert(flaggedKeys == Set("a"))
  }

  test("intervalCoverage: overlaps count once, touching merges, gaps split") {
    val iv = Seq(
      // a: [0,10) ∪ [5,20) ∪ [20,30) — overlap + touch → one island
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 30L),
      // b: [0,10), [15,20) — a real gap → two islands
      ("b", 0L, 10L), ("b", 15L, 20L),
      // c: contained interval never extends its island
      ("c", 0L, 100L), ("c", 10L, 20L), ("c", 150L, 160L))
      .toDF("key", "s", "e")
    val out = TimeSeries.intervalCoverage(iv, "key", "s", "e")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((1L, 30L, 30L)), out("a"))
    assert(out("b") == ((2L, 15L, 20L)), out("b"))
    assert(out("c") == ((2L, 110L, 160L)), out("c"))
  }

  test("intervalCoverage: start ties and input order cannot move the result") {
    // two tied starts with different ends, plus shuffled arrival order
    val rows = Seq(("k", 0L, 10L), ("k", 0L, 5L), ("k", 12L, 13L), ("k", 3L, 4L))
    val expect = ("k", 2L, 11L, 13L) // [0,10) ∪ [12,13)
    for (perm <- Seq(rows, rows.reverse, rows.sortBy(_._3))) {
      val out = TimeSeries.intervalCoverage(
        perm.toDF("key", "s", "e").repartition(3), "key", "s", "e")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq == Seq(expect), s"perm=$perm -> ${out.toSeq}")
    }
  }

  private def trend(rows: (String, Long, Long)*): Map[String, (Long, Long, Long, Option[Long])] =
    TimeSeries.olsTrend(rows.toSeq.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("olsTrend: hand-checked exact slopes, up and down") {
    val out = trend(
      // y = 2x + 1 exactly: sxy = 3·13−3·9 = 12, sxx = 3·5−9 = 6 → 2.0
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L),
      // y = 5 − 2x: sxy = −12 → −2.0, exactly divisible
      ("dn", 0L, 5L), ("dn", 1L, 3L), ("dn", 2L, 1L))
    assert(out("up") == ((3L, 12L, 6L, Some(2000000L))))
    assert(out("dn") == ((3L, -12L, 6L, Some(-2000000L))))
  }

  test("olsTrend: negative non-divisible slope FLOORS (the Spark-div-vs-SQL-// trap)") {
    // x∈{0,1,3}, y=(1,1,0): sxy = 3·1−4·2 = −5, sxx = 3·10−16 = 14
    // slope = −5e6/14 = −357142.857… → floor −357143 (truncation: −357142)
    val out = trend(("k", 0L, 1L), ("k", 1L, 1L), ("k", 3L, 0L))
    assert(out("k") == ((3L, -5L, 14L, Some(-357143L))))
  }

  test("olsTrend: a single distinct x has no slope — NULL, never a divide error") {
    val out = trend(("k", 7L, 1L), ("k", 7L, 9L))
    val (n, _, sxx, slope) = out("k")
    assert(n == 2L && sxx == 0L && slope.isEmpty, out("k"))
  }

  private def decay(halfLife: Int, rows: (String, String, Double)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("k", "t", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("t"))).drop("t")
    TimeSeries.decayScore(df, "k", "ts", "value", halfLife)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("decayScore: staircase halving per full half-life, anchored at the newest day") {
    // ages 0 / 7 / 14 days at 7-day half-life → weights 1, 1/2, 1/4;
    // all on one key: 100 + 50 + 25 cents-worth in micro-units
    val out = decay(7,
      ("u", "2024-03-15 12:00:00", 1.00),
      ("u", "2024-03-08 12:00:00", 1.00),
      ("u", "2024-03-01 12:00:00", 1.00))
    assert(out("u") == ((3L, 300L, 100000000L + 50000000L + 25000000L)))
  }

  test("decayScore: within a half-life the weight does NOT change (the documented staircase)") {
    val out = decay(7,
      ("u", "2024-03-15 12:00:00", 1.00),
      ("u", "2024-03-10 12:00:00", 1.00)) // 5 days old: still weight 1
    assert(out("u") == ((2L, 200L, 200000000L)))
  }

  test("decayScore: negative refund cents FLOOR like the oracle's // (not truncate)") {
    // -1 cent, 7 half-lives old: -1e6/128 = -7812.5 → floor -7813
    val out = decay(1,
      ("u", "2024-03-15 12:00:00", 5.00),
      ("u", "2024-03-08 12:00:00", -0.01))
    assert(out("u") == ((2L, 499L, 500000000L - 7813L)))
  }

  test("decayScore: ancient events cap at 62 half-lives and score 0, never a shift overflow") {
    val out = decay(1,
      ("u", "2024-03-15 12:00:00", 1.00),
      ("u", "1970-01-01 12:00:00", 9999.99))
    assert(out("u") == ((2L, 1000099L, 100000000L)))
  }

  private def backtest(season: Int, rows: (String, String, Double)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("k", "t", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("t"))).drop("t")
    TimeSeries.seasonalNaiveBacktest(df, "k", "ts", "value", season)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
  }

  test("seasonalNaiveBacktest: hand-checked MAE and WMAPE; first season excluded") {
    // 1-day season: days 1,2,3 with 1.00, 2.00, 4.00 → scored days are
    // 2 (a=200, f=100) and 3 (a=400, f=200): Σa=600, Σ|e|=300,
    // mae = 300 div 2 = 150, wmape = 10000·300 div 600 = 5000
    val out = backtest(1,
      ("k", "2024-03-01 10:00:00", 1.00),
      ("k", "2024-03-02 10:00:00", 2.00),
      ("k", "2024-03-03 10:00:00", 4.00))
    assert(out("k") == ((2L, 600L, 300L, 150L, Some(5000L))))
  }

  test("seasonalNaiveBacktest: same-day events aggregate before forecasting; zero-sum actuals yield NULL wmape") {
    // two events on day 2 sum to 0.00 → Σa over scored days = 0 →
    // wmape NULL, mae still defined
    val out = backtest(1,
      ("k", "2024-03-01 10:00:00", 3.00),
      ("k", "2024-03-02 10:00:00", 5.00),
      ("k", "2024-03-02 11:00:00", -5.00))
    assert(out("k") == ((1L, 0L, 300L, 300L, None)))
  }

  test("seasonalNaiveBacktest: a gap in the series scores only aligned days") {
    // days 1 and 3 with a 7-day season=2: day 3 aligns to day 1 ✓;
    // nothing else aligns
    val out = backtest(2,
      ("k", "2024-03-01 10:00:00", 2.00),
      ("k", "2024-03-03 10:00:00", 2.50))
    assert(out("k") == ((1L, 250L, 50L, 50L, Some(2000L))))
  }

  private def acf(lags: Seq[Int], rows: (String, String, Double)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("k", "t", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("t"))).drop("t")
    TimeSeries.autocorrelation(df, "k", "ts", "value", lags)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
  }

  test("autocorrelation: a period-2 series scores −1 at lag 1 and +1 at lag 2") {
    // daily values 1,3,1,3,1,3 → lag-1 pairs perfectly anti-aligned,
    // lag-2 pairs identical (hand moments: n=5, r=−24/24 at lag 1)
    val rows = (1 to 6).map(d =>
      ("k", f"2024-03-$d%02d 10:00:00", if (d % 2 == 1) 1.00 else 3.00))
    val out = acf(Seq(1, 2), rows: _*)
    assert(out(("k", 1L)) == ((5L, Some(-1.0))))
    assert(out(("k", 2L)) == ((4L, Some(1.0))))
  }

  test("autocorrelation: constant series → NULL (zero variance), never NaN; gaps align pairwise") {
    val flat = acf(Seq(1),
      ("k", "2024-03-01 10:00:00", 2.00),
      ("k", "2024-03-02 10:00:00", 2.00),
      ("k", "2024-03-03 10:00:00", 2.00))
    assert(flat(("k", 1L)) == ((2L, None)))
    // days 1,2,4,5: lag-1 aligns (2,1) and (5,4) only; a lag with no
    // aligned pairs emits no row
    val gap = acf(Seq(1, 10),
      ("k", "2024-03-01 10:00:00", 1.00),
      ("k", "2024-03-02 10:00:00", 2.00),
      ("k", "2024-03-04 10:00:00", 3.00),
      ("k", "2024-03-05 10:00:00", 5.00))
    assert(gap(("k", 1L))._1 == 2L)
    assert(!gap.contains(("k", 10L)))
  }

  private def cusum(pct: Int, rows: (String, String, Double)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("k", "t", "value")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("t"))).drop("t")
    TimeSeries.cusumChangepoints(df, "k", "ts", "value", pct)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
  }

  test("cusumChangepoints: a level shift alarms on the shifted days, hand-replayed") {
    // days 1-4 at 1.00, days 5-8 at 2.00 → target = 1200 div 8 = 150,
    // threshold = 75. x−μ: −50×4 then +50×4; S runs −50..−200 then back
    // to 0; runmin clamps at −200, so C = 0,0,0,0,50,100,150,200.
    // Alarms (C>75): days 6,7,8 → first alarm 2024-03-06 = epoch day 19788.
    val out = cusum(50,
      ("k", "2024-03-01 10:00:00", 1.00), ("k", "2024-03-02 10:00:00", 1.00),
      ("k", "2024-03-03 10:00:00", 1.00), ("k", "2024-03-04 10:00:00", 1.00),
      ("k", "2024-03-05 10:00:00", 2.00), ("k", "2024-03-06 10:00:00", 2.00),
      ("k", "2024-03-07 10:00:00", 2.00), ("k", "2024-03-08 10:00:00", 2.00))
    assert(out("k") == ((8L, 150L, 75L, 200L, 3L, Some(19788L))))
  }

  test("cusumChangepoints: a flat series never alarms and first_alarm_day is NULL") {
    val out = cusum(50,
      ("k", "2024-03-01 10:00:00", 3.00),
      ("k", "2024-03-02 10:00:00", 3.00),
      ("k", "2024-03-03 10:00:00", 3.00))
    assert(out("k") == ((3L, 300L, 150L, 0L, 0L, None)))
  }

  test("cusumChangepoints: the max(0,·) clamp forgets a dip — recovery restarts from zero") {
    // 2.00, 1.00, 2.00 → target = 500 div 3 = 166 (floored), threshold 83.
    // x−μ: 34, −66, 34; S: 34, −32, 2; min(0,runmin): 0, −32, −32;
    // C: 34, 0, 34 — day 3's C equals day 1's, the dip did not persist.
    val out = cusum(50,
      ("k", "2024-03-01 10:00:00", 2.00),
      ("k", "2024-03-02 10:00:00", 1.00),
      ("k", "2024-03-03 10:00:00", 2.00))
    assert(out("k") == ((3L, 166L, 83L, 34L, 0L, None)))
  }

  test("cusumChangepoints: negative sums FLOOR the mean and threshold like the oracle's //") {
    // −1.00 and −0.51 → sum −151, target = floor(−75.5) = −76 (truncation
    // would give −75), threshold = floor(−38.0) = −38. x−μ: −24, +25;
    // S: −24, 1; C: 0, 25. Both C > −38 → both days alarm.
    val out = cusum(50,
      ("k", "2024-03-01 10:00:00", -1.00),
      ("k", "2024-03-02 10:00:00", -0.51))
    assert(out("k") == ((2L, -76L, -38L, 25L, 2L, Some(19783L))))
  }

  test("theilSenTrend: one outlier day bends OLS but not the pairwise-slope median") {
    // (0,0),(1,10),(2,20),(3,1000): 6 pair slopes in micro-units
    // [1e7, 1e7, 1e7, 333333333, 495000000, 980000000] → lower median
    // rank (6+1) div 2 = 3 → 1e7 (the clean trend); OLS on the same
    // points fits ~3.1e8
    val daily = Seq(("k", 0L, 0L), ("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 1000L))
      .toDF("k", "x", "y")
    val ts = TimeSeries.theilSenTrend(daily, "k", "x", "y").head()
    assert((ts.getLong(1), ts.getLong(2)) == ((6L, 10000000L)))
    val ols = TimeSeries.olsTrend(daily, "k", "x", "y").head().getLong(4)
    assert(ols > 300000000L)
  }

  test("theilSenTrend: negative non-divisible slope floors; equal-x pairs are skipped") {
    // (0,5),(3,0): −5e6/3 → −1666667 floored (truncation gives −1666666);
    // the duplicate x=0 point adds an equal-x pair that must be skipped
    // and one more downhill pair
    val daily = Seq(("k", 0L, 5L), ("k", 3L, 0L)).toDF("k", "x", "y")
    val r = TimeSeries.theilSenTrend(daily, "k", "x", "y").head()
    assert((r.getLong(1), r.getLong(2)) == ((1L, -1666667L)))
    val withDup = Seq(("k", 0L, 5L), ("k", 0L, 7L), ("k", 3L, 0L)).toDF("k", "x", "y")
    val r2 = TimeSeries.theilSenTrend(withDup, "k", "x", "y").head()
    // pairs: (0,5)→(3,0) = −1666667 and (0,7)→(3,0) = −2333334; n=2,
    // rank (2+1) div 2 = 1 → the smaller slope −2333334
    assert((r2.getLong(1), r2.getLong(2)) == ((2L, -2333334L)))
  }

  private def mk(rows: (String, Long, Long)*): Map[String, (Long, Long, Long, Option[Long])] =
    TimeSeries.mannKendall(rows.toDF("k", "x", "y"), "k", "x", "y")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap

  test("mannKendall: strictly increasing 5-point series — hand-replayed S, Var, z") {
    // all 10 pairs ascend → S = 10; no ties → 18·Var = 5·4·15 = 300;
    // continuity-corrected s_adj = 9 → z = 9/√(300/18)·1e6 = 2204541
    // micro-units (> the 1.96e6 two-sided 5% gate, as a clean monotone
    // run of 5 should be)
    val out = mk((0L to 4L).map(i => ("k", i, i + 1L)): _*)
    assert(out("k") == ((5L, 10L, 300L, Some(2204541L))))
  }

  test("mannKendall: ties subtract variance; downhill z replays the IEEE tree") {
    // (0,5),(1,3),(2,3),(3,1): five downhill pairs + one tied pair →
    // S = −5; base 4·3·13 = 156, tie group t=2 subtracts 2·1·9 = 18 →
    // var18 = 138; s_adj = −4 → z = −4/√(138/18)·1e6 = −1444630
    val out = mk(("k", 0L, 5L), ("k", 1L, 3L), ("k", 2L, 3L), ("k", 3L, 1L))
    assert(out("k") == ((4L, -5L, 138L, Some(-1444630L))))
  }

  test("dayOfWeekProfile: portable dow (0=Sunday), peak ties to the smaller index") {
    // 2024-01-07 is a Sunday: ((19729 + 4) % 7) = 0 — the portability
    // contract (Spark dayofweek says 1, DuckDB says 0; we use neither)
    val df = Seq(
      ("k", "2024-01-07 10:00:00"), ("k", "2024-01-07 11:00:00"),
      ("k", "2024-01-08 10:00:00")).toDF("k", "ts")
    val out = TimeSeries.dayOfWeekProfile(df, "k", "ts")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out == Map(
      0L -> ((2L, 6666L, 1)),
      1L -> ((1L, 3333L, 0))))
  }

  test("dispersionIndex: bursty vs metronomic keys over the shared calendar span") {
    // global span day0..day2 = 3 days (day1 has zero events — it must
    // count). bursty: counts (3,0,1) → S=4, Σy²=10 →
    // (3·10−16)·1e6 div (3·4) = 1166666; steady: (1,1,1) → 0 exactly
    val df = Seq(
      ("bursty", "2024-03-01 01:00:00"), ("bursty", "2024-03-01 02:00:00"),
      ("bursty", "2024-03-01 03:00:00"), ("bursty", "2024-03-03 01:00:00"),
      ("steady", "2024-03-01 05:00:00"), ("steady", "2024-03-02 05:00:00"),
      ("steady", "2024-03-03 05:00:00")).toDF("k", "ts")
    val out = TimeSeries.dispersionIndex(df, "k", "ts")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "bursty" -> ((3L, 4L, 1166666L)),
      "steady" -> ((3L, 3L, 0L))))
  }

  test("mannKendall: all-tied and single-point keys report with NULL z, never blow up") {
    // all-tied: S = 0 and the tie correction cancels the base exactly
    // (3·2·11 − 3·2·11 = 0); single-point: no pairs at all — the key
    // must still surface via the left join, not vanish
    val out = mk(("flat", 0L, 7L), ("flat", 1L, 7L), ("flat", 2L, 7L),
      ("solo", 0L, 42L))
    assert(out("flat") == ((3L, 0L, 0L, None)))
    assert(out("solo") == ((1L, 0L, 0L, None)))
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) = // (event_id, user, ts)
    rows.toSeq.toDF("event_id", "user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
      .withColumn("value", lit(1.0))

  test("gap over threshold starts a new session; per-user independence") {
    val df = ev(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 10:30:00"),  // same session (30m < 1h)
      (3L, 1L, "2024-01-01 12:00:00"),  // new session (90m gap)
      (4L, 2L, "2024-01-01 10:00:00"))  // other user
    val out = Sessions.assign(df, "user_id", "ts", 3600, Seq("event_id"))
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 2L)
    assert(out(4L) == 1L)
  }

  test("boundary: gap exactly equal to threshold stays in session") {
    val df = ev(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 11:00:00")) // exactly 3600s -> NOT > gap
    val out = Sessions.assign(df, "user_id", "ts", 3600, Seq("event_id"))
      .agg(max("session_seq")).head().getLong(0)
    assert(out == 1L)
  }

  private def evt(rows: (Long, Long, String, String)*) = // (id, user, type, ts)
    rows.toSeq.toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")

  private def funnelCounts(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    Sessions.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSeconds = 7L * 86400,
        tieBreak = Seq("event_id"))
      .collect().map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap

  test("conversionLatency: earliest-click anchoring, pre-click purchases don't convert, " +
       "exact nearest-rank percentiles") {
    val df = evt(
      (1L, 1L, "click", "2024-01-01 00:00:00"), (2L, 1L, "purchase", "2024-01-01 00:00:10"),
      (3L, 2L, "click", "2024-01-01 00:00:00"), (4L, 2L, "purchase", "2024-01-01 00:00:20"),
      (5L, 3L, "click", "2024-01-01 00:00:00"), // never converts
      (6L, 4L, "purchase", "2024-01-01 00:00:00"), // purchase BEFORE the click
      (7L, 4L, "click", "2024-01-01 00:00:05"),
      (8L, 5L, "purchase", "2024-01-01 00:00:00"), // no click at all
      // u6: the SECOND click is earlier — anchor is min(click ts)
      (9L, 6L, "click", "2024-01-01 00:01:40"), (10L, 6L, "click", "2024-01-01 00:00:50"),
      (11L, 6L, "purchase", "2024-01-01 00:01:00"))
    val r = Sessions.conversionLatency(df, "user_id", "ts", "event_type",
      "click", "purchase").head()
    // n_from = 5 clickers, converted = u1(10s), u2(20s), u6(10s)
    assert(r.toSeq == Seq(5L, 3L, 6000L, 10L, 20L, 20L))
  }

  test("funnel: steps must occur in order; out-of-order and missing steps don't count") {
    val df = evt(
      // user 1: full ordered conversion
      (10L, 1L, "view", "2024-01-01 10:00:00"),
      (11L, 1L, "click", "2024-01-01 10:05:00"),
      (12L, 1L, "purchase", "2024-01-01 10:10:00"),
      // user 2: click BEFORE the view only — view counts, click doesn't
      (20L, 2L, "click", "2024-01-01 09:00:00"),
      (21L, 2L, "view", "2024-01-01 10:00:00"),
      // user 3: purchase lands between view and click — steps 1,2 only
      (30L, 3L, "view", "2024-01-01 10:00:00"),
      (31L, 3L, "purchase", "2024-01-01 10:02:00"),
      (32L, 3L, "click", "2024-01-01 10:05:00"),
      // user 5: no view at all — nothing counts
      (50L, 5L, "click", "2024-01-01 10:00:00"),
      (51L, 5L, "purchase", "2024-01-01 10:05:00"))
    val out = funnelCounts(df)
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L), out)
  }

  test("funnel: later steps beyond the horizon of the FIRST view don't count") {
    val df = evt(
      // click 8 days after the first view — outside the 7-day horizon
      (10L, 1L, "view", "2024-01-01 10:00:00"),
      (11L, 1L, "click", "2024-01-09 10:00:00"),
      // click inside, purchase outside: steps 1,2 only
      (20L, 2L, "view", "2024-01-01 10:00:00"),
      (21L, 2L, "click", "2024-01-02 10:00:00"),
      (22L, 2L, "purchase", "2024-01-09 10:00:00"),
      // a LATER view cannot re-anchor the horizon
      (30L, 3L, "view", "2024-01-01 10:00:00"),
      (31L, 3L, "view", "2024-01-05 10:00:00"),
      (32L, 3L, "click", "2024-01-10 10:00:00"))
    val out = funnelCounts(df)
    assert(out == Map(1 -> 3L, 2 -> 1L, 3 -> 0L), out)
  }

  test("funnel: equal timestamps resolve by the tie-break order") {
    val df = evt(
      // view(70) < purchase(71) < click(72) at the SAME instant: the
      // purchase precedes the click in tie-break order, so it has no
      // completed click prefix and must not count
      (70L, 7L, "view", "2024-01-01 10:00:00"),
      (71L, 7L, "purchase", "2024-01-01 10:00:00"),
      (72L, 7L, "click", "2024-01-01 10:00:00"))
    val out = funnelCounts(df)
    assert(out == Map(1 -> 1L, 2 -> 1L, 3 -> 0L), out)
  }

  test("retention: whole-week offsets, pre-anchor excluded, no-anchor users absent") {
    val df = evt(
      // user 1 signs up Mon 2024-01-01; active same week, week 1, week 2
      (10L, 1L, "signup", "2024-01-01 10:00:00"),
      (11L, 1L, "view", "2024-01-03 10:00:00"),    // offset 0
      (12L, 1L, "click", "2024-01-08 09:59:59"),   // 1s under 7 days → offset 0
      (13L, 1L, "view", "2024-01-08 10:00:00"),    // exactly 7 days → offset 1
      (14L, 1L, "view", "2024-01-20 10:00:00"),    // offset 2
      // user 2: same cohort week (signs up Wed), activity before signup
      // must not count; nothing after → only offset 0 (the signup itself)
      (20L, 2L, "view", "2024-01-02 10:00:00"),
      (21L, 2L, "signup", "2024-01-03 10:00:00"),
      // user 3: never signs up → absent entirely
      (30L, 3L, "view", "2024-01-01 10:00:00"))
    val out = Sessions.retention(df, "user_id", "ts", "event_type", "signup", 8)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("n_active")).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 2L,  // users 1 and 2
      ("2024-01-01", 1) -> 1L,
      ("2024-01-01", 2) -> 1L), out)
  }

  test("retention: offsets past maxWeeks are cut") {
    val df = evt(
      (10L, 1L, "signup", "2024-01-01 10:00:00"),
      (11L, 1L, "view", "2024-06-01 10:00:00")) // ~21 weeks out
    val out = Sessions.retention(df, "user_id", "ts", "event_type", "signup", 8)
      .agg(max("week_offset")).head().getInt(0)
    assert(out == 0) // only the signup row itself survives the cut
  }

  test("aggregate rolls up counts and bounds per session") {
    val df = ev(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 10:30:00"),
      (3L, 1L, "2024-01-01 12:00:00"))
    val out = Sessions.aggregate(df, "user_id", "ts", 3600).orderBy("session_seq").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("transition matrix: counts per ordered pair, floored basis points") {
    import spark.implicits._
    // user 1: A B A C  -> A>B, B>A, A>C ; user 2: A B -> A>B
    // from A: {B:2, C:1} -> p_bp 6666 / 3333 ; from B: {A:1} -> 10000
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "C"),
      (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("user_id", "seq", "event_type")
      .withColumn("ts", expr("timestamp_micros(seq * 1000000)"))
    val out = Sessions.transitionMatrix(df, "user_id", "ts", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("A", "B") -> (2L, 6666L),
      ("A", "C") -> (1L, 3333L),
      ("B", "A") -> (1L, 10000L)))
  }

  test("transition matrix: sequences never cross users; tie-break column orders simultaneous events") {
    import spark.implicits._
    // both events at the SAME ts — the event_id tie-break decides X>Y,
    // and user 2's isolated single event emits nothing
    val df = Seq(
      (1L, 10L, "X"), (1L, 20L, "Y"),
      (2L, 1L, "Z"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(1000000)"))
    val out = Sessions.transitionMatrix(df, "user_id", "ts", "event_type", Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("X", "Y") -> 1L))
  }

  private def streaks(rows: (Long, String)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    Sessions.longestStreak(df, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

  test("streaks: islands split on missing days; repeats within a day collapse") {
    // user 1: days {d,d+1,d+2}, {d+4,d+5}, {d+9} — three islands
    val out = streaks(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 23:00:00"), // same day twice
      (1L, "2024-01-02 05:00:00"), (1L, "2024-01-03 00:00:00"),
      (1L, "2024-01-05 12:00:00"), (1L, "2024-01-06 12:00:00"),
      (1L, "2024-01-10 12:00:00"),
      (2L, "2024-01-07 01:00:00")) // single-day user: streak 1
    val day0 = 19723L // 2024-01-01 UTC as epoch day
    assert(out(1L) == ((6L, 3L, 3L, day0)))
    assert(out(2L) == ((1L, 1L, 1L, day0 + 6)))
  }

  test("streaks: equal-length maxima report the EARLIEST start") {
    val out = streaks(
      (1L, "2024-02-01 10:00:00"), (1L, "2024-02-02 10:00:00"),
      (1L, "2024-02-10 10:00:00"), (1L, "2024-02-11 10:00:00"))
    val (active, nStreaks, longest, start) = out(1L)
    assert(active == 4L && nStreaks == 2L && longest == 2L)
    assert(start == 19754L) // 2024-02-01, not the later equal streak
  }

  test("streaks: day boundary is UTC-midnight of the epoch — 23:59:59 and 00:00:01 are consecutive days") {
    val out = streaks(
      (1L, "2024-03-01 23:59:59"), (1L, "2024-03-02 00:00:01"))
    assert(out(1L)._3 == 2L) // one 2-day streak, not a single day
  }

  test("rfm: perfect-quintile population scores 1..5; ties at a cut land in the lower bucket") {
    import spark.implicits._
    // user u (1..5): u purchases, all on day 2024-01-0(u+1), value 10·u
    // each → r_days = 5−u, f_n = u, m_cents = 1000·u². With 5 distinct
    // values per metric the exact quintile cuts are t20..t80 = the 1st
    // .. 4th values, so f/m score u exactly; recency's best value TIES
    // its own t20 cut (0 < 0 fails), so r_score tops out at 4 — the
    // documented ties-down convention, symmetric with a shared-max f
    val rows = for { u <- 1 to 5; _ <- 1 to u } yield
      (u.toLong, f"2024-01-0${u + 1}%s 12:00:00", 10.0 * u)
    val df = rows.toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = Sessions.rfmSegments(df, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    assert(out(1L) == ((4L, 1L, 1000L, "111")))
    assert(out(2L) == ((3L, 2L, 4000L, "122")))
    assert(out(3L) == ((2L, 3L, 9000L, "233")))
    assert(out(4L) == ((1L, 4L, 16000L, "344")))
    assert(out(5L) == ((0L, 5L, 25000L, "455")))
  }

  test("rfm: cents are DECIMAL-exact — 0.1-dollar values never wobble a long cent") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:00:00", 0.10), (1L, "2024-01-01 01:00:00", 0.20))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val m = Sessions.rfmSegments(df, "user_id", "ts", "value")
      .select("m_cents").head().getLong(0)
    assert(m == 30L) // 0.1+0.2 in double is 0.30000000000000004; cents must be 30
  }

  test("cohort LTV: weekly triangle — cohorts by first purchase, exact cents, running cumulative") {
    import java.time.LocalDate
    // u1 buys in week A and week A+1; u2 week A only; u3 first buys in
    // week A+1 (its own cohort, even though week A+1 also holds u1 rev)
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 10.00),
      (1L, "2024-01-10 10:00:00", 5.50),
      (2L, "2024-01-02 10:00:00", 2.25),
      (3L, "2024-01-11 10:00:00", 1.00))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = Sessions.cohortLtv(df, "user_id", "ts", "value", periodDays = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def weekStart(d: String) = {
      val day = LocalDate.parse(d).toEpochDay
      LocalDate.ofEpochDay(day / 7 * 7).toString
    }
    val wA = weekStart("2024-01-01")
    val wB = weekStart("2024-01-11")
    assert(out == Map(
      (wA, 0L) -> ((2L, 1225L, 1225L)), // u1 1000 + u2 225
      (wA, 1L) -> ((1L, 550L, 1775L)),  // u1's week-2 revenue, cum rolls
      (wB, 0L) -> ((1L, 100L, 100L))))  // u3's own cohort
  }

  test("top paths: first-k ordered journey per user, counted, tie-broken on the id column") {
    val df = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "login"),
      (2L, 1L, "2024-01-01 10:01:00", "browse"),
      (3L, 1L, "2024-01-01 10:02:00", "buy"),
      (4L, 2L, "2024-01-01 11:00:00", "login"),
      (5L, 2L, "2024-01-01 11:01:00", "browse"),
      (6L, 2L, "2024-01-01 11:02:00", "buy"),
      (7L, 3L, "2024-01-01 12:00:00", "login"),
      (8L, 3L, "2024-01-01 12:01:00", "buy"),
      // u4: SAME timestamp — event_id orders the path ("b" before "a")
      (9L, 4L, "2024-01-01 13:00:00", "b"),
      (10L, 4L, "2024-01-01 13:00:00", "a"))
      .toDF("event_id", "user_id", "t", "event_type")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    val out = Sessions.topPaths(df, "user_id", "ts", "event_type", "event_id",
      pathLen = 3, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("login>browse>buy" -> 2L, "login>buy" -> 1L, "b>a" -> 1L))
    // pathLen bounds the journey: only the first 2 events count
    val short = Sessions.topPaths(df, "user_id", "ts", "event_type", "event_id",
      pathLen = 2, topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(short == Map("login>browse" -> 2L, "login>buy" -> 1L, "b>a" -> 1L))
  }

  private def km(rows: (Long, String)*) = {
    import spark.implicits._
    val df = rows.toSeq.toDF("user_id", "t")
      .withColumn("ts", to_timestamp(col("t"))).drop("t")
    Sessions.kaplanMeier(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
  }

  private def lnFp(x: Double): Long = Math.round(Math.log(x) * 1e6)

  test("kaplanMeier: hand-replayed factors; final-day actives are censored, not churned") {
    // A active d1-d3 (censored: last = max), B d1-d2 (churns d2),
    // C d1 only (churns d1). d1: 3 at risk, 1 churn → ln(2/3);
    // d2: 2 at risk, 1 churn → ln(1/2); d3: 1 at risk, 0 churn.
    val d1 = 19783L // 2024-03-01
    val out = km(
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-02 10:00:00"), (1L, "2024-03-03 10:00:00"),
      (2L, "2024-03-01 11:00:00"), (2L, "2024-03-02 11:00:00"),
      (3L, "2024-03-01 12:00:00"))
    assert(out(d1) == ((3L, 1L, Some(lnFp(2.0 / 3)), Some(lnFp(2.0 / 3)))))
    assert(out(d1 + 1) == ((2L, 1L, Some(lnFp(0.5)), Some(lnFp(2.0 / 3) + lnFp(0.5)))))
    assert(out(d1 + 2) == ((1L, 0L, Some(0L), Some(lnFp(2.0 / 3) + lnFp(0.5)))))
  }

  test("kaplanMeier: extinction (d = n) yields NULL from that day on, never -inf; gap days pass through") {
    // A and B churn on d1 (max_day = d3 via C active only d3):
    // d1 consumes the whole at-risk set → extinct; d2 is an empty gap
    // day; d3 has C at risk (censored)
    val d1 = 19783L
    val out = km(
      (1L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
      (3L, "2024-03-03 12:00:00"))
    assert(out(d1) == ((2L, 2L, None, None)))
    assert(out(d1 + 1) == ((0L, 0L, Some(0L), None)))
    assert(out(d1 + 2) == ((1L, 0L, Some(0L), None)))
  }
}

package graft.ops

import graft.SparkSpec
// (freshness tests at the bottom use the same harness)
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  import DataQuality._

  private val dirty = Seq(
    // (id, status, price): id 3 duplicated, one null status, one bad
    // status, one negative price
    (Some(1L), Some("F"), 10.0),
    (Some(2L), Some("O"), 20.0),
    (Some(3L), Some("P"), 30.0),
    (Some(3L), Some("X"), -5.0),
    (None, None, 40.0)
  ).toDF("id", "status", "price")

  private def rep(checks: Seq[Check]): Map[String, (Long, Int)] =
    report(dirty, checks).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap

  test("each constraint type reports its metric and polarity") {
    val out = rep(Seq(
      rowCount(5L, 5L),
      completeness("id", 10000L),
      completeness("price", 10000L),
      uniqueness("id"),
      bounds("price", lit(0.0), lit(100.0)),
      acceptedValues("status", Seq("F", "O", "P"))))
    assert(out("row_count") == ((5L, 1)))
    assert(out("completeness_id") == ((8000L, 0)))    // 4/5 -> 8000 bp, fails
    assert(out("completeness_price") == ((10000L, 1)))
    assert(out("uniqueness_id") == ((1L, 0)))          // one duplicate surplus
    assert(out("bounds_price") == ((1L, 0)))           // the -5.0 row
    assert(out("accepted_status") == ((1L, 0)))        // 'X'; the NULL is not a violation
  }

  test("thresholds: completeness accepts at the floored bar; bounds inclusive") {
    val out = rep(Seq(
      completeness("id", 8000L),                       // exactly the floored value
      bounds("price", lit(-5.0), lit(40.0))))          // hits both endpoints
    assert(out("completeness_id") == ((8000L, 1)))
    assert(out("bounds_price") == ((0L, 1)))
  }

  test("empty table: violation metrics are 0, rowCount and completeness fail") {
    val empty = dirty.where(lit(false))
    val out = report(empty, Seq(rowCount(1L), completeness("id", 1L),
      bounds("price", lit(0.0), lit(1.0)), uniqueness("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out("row_count") == ((0L, 0)))
    assert(out("completeness_id") == ((0L, 0)))        // 0 div 0 -> null -> 0, below any bar
    assert(out("bounds_price") == ((0L, 1)))           // nothing violates
    assert(out("uniqueness_id") == ((0L, 1)))
  }

  test("refViolations: anti-join counts non-null orphans only") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("ck")
    val r = refViolations(fact, "k", dim, "ck", "ref_t").collect().head
    assert((r.getString(0), r.getLong(1), r.getInt(2)) == (("ref_t", 1L, 0)))
    val clean = refViolations(fact.where(col("k") < 3), "k", dim, "ck", "ref_t")
      .collect().head
    assert((clean.getLong(1), clean.getInt(2)) == ((0L, 1)))
  }

  test("report is one pass: no join, one exchange in the physical plan") {
    val df = report(dirty, Seq(rowCount(1L), completeness("id", 1L),
      bounds("price", lit(0.0), lit(100.0))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException](
      report(dirty, Seq(rowCount(1L), rowCount(2L))))
  }

  test("freshness: lag is against the freshest slice, the trailing window is " +
       "anchored at the data's own max") {
    val df = Seq(
      ("a", "2024-01-10 12:00:00"), ("a", "2024-01-10 11:00:00"),
      ("b", "2024-01-09 12:00:00"), // 86400 s behind a
      ("c", "2024-01-01 00:00:00")) // far stale
      .toDF("slice_in", "t").withColumn("ts", to_timestamp(col("t")))
    val out = DataQuality.freshness(df, "slice_in", "ts", recentSeconds = 86400L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    // a: both events inside (t_max−86400, t_max]; b: exactly at the
    // open boundary — es > t_max − 86400 is FALSE at equality
    assert(out == Map(
      "a" -> ((2L, 0L, 2L)),
      "b" -> ((1L, 86400L, 0L)),
      "c" -> ((1L, 820800L, 0L))))
  }

  test("jsonKeyCensus: key shares over parseable rows; unparseable payloads drop") {
    import spark.implicits._
    val df = Seq(
      Some("""{"a": 1, "b": "x"}"""),
      Some("""{"a": 2}"""),
      Some("not json"),
      None).toDF("payload")
    val out = DataQuality.jsonKeyCensus(df, "payload")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 2 parseable rows: a in both (distinct values 1,2), b in one
    assert(out == Map(
      "a" -> ((2L, 2L, 10000L)),
      "b" -> ((1L, 1L, 5000L))))
  }

  test("fdViolations: violating group counted once, all-NULL rhs determines nothing") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (1L, Some("a")), (2L, Some("a")),
      (2L, Some("b")), (3L, None: Option[String]))
      .toDF("k", "v")
    val r = DataQuality.fdViolations(df, Seq("k"), "v", "k_determines_v").head()
    // groups: 1→{a} ok, 2→{a,b} violates, 3→{} (all NULL) ok
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getInt(5)) ==
      (("k_determines_v", 3L, 1L, 3333L, 2L, 0)))
    val unique = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "v")
    val ok = DataQuality.fdViolations(unique, Seq("k"), "v", "key_check").head()
    assert((ok.getLong(2), ok.getInt(5)) == ((0L, 1)))
  }
}

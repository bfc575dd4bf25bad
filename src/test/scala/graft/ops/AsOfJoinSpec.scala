package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", "2024-01-01 10:00:00", 100.0),
    ("A", "2024-01-01 10:05:00", 101.0),
    ("A", "2024-01-01 10:10:00", 102.0),
    ("B", "2024-01-01 10:00:00", 50.0)
  ).toDF("sym", "t", "px")
    .select(col("sym"), to_timestamp(col("t")).as("qts"), col("px"))

  private val trades = Seq(
    ("A", "2024-01-01 10:04:59", 10L), // -> 100.0 (10:00)
    ("A", "2024-01-01 10:05:00", 20L), // -> 101.0 (tie: at-or-before)
    ("A", "2024-01-01 10:30:00", 30L), // -> 102.0 (latest)
    ("B", "2024-01-01 09:59:59", 40L), // -> null  (no prior quote)
    ("C", "2024-01-01 12:00:00", 50L)  // -> null  (unknown key)
  ).toDF("sym", "t", "qty")
    .select(col("sym"), to_timestamp(col("t")).as("tts"), col("qty"))

  test("as-of join picks latest at-or-before per key; misses are null") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("qts", "px"))
      .collect().map(r => r.getAs[Long]("qty") ->
        (if (r.isNullAt(r.fieldIndex("px"))) null else Double.box(r.getAs[Double]("px")))).toMap
    assert(out(10L) == 100.0)
    assert(out(20L) == 101.0) // inclusive: simultaneous quote visible
    assert(out(30L) == 102.0)
    assert(out(40L) == null)
    assert(out(50L) == null)
  }

  test("forward direction: earliest at-or-after; inclusive on ties; misses null") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"),
      direction = "forward")
      .collect().map(r => r.getAs[Long]("qty") ->
        (if (r.isNullAt(r.fieldIndex("px"))) null else Double.box(r.getAs[Double]("px")))).toMap
    assert(out(10L) == 101.0) // next quote at 10:05
    assert(out(20L) == 101.0) // inclusive: simultaneous quote matches forward too
    assert(out(30L) == null)  // nothing after 10:30
    assert(out(40L) == 50.0)  // B's quote is ahead of the trade
    assert(out(50L) == null)
  }

  test("nearest direction: closer side wins, exact ties take backward") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("qts", "px"),
      direction = "nearest")
      .collect().map(r => r.getAs[Long]("qty") ->
        (if (r.isNullAt(r.fieldIndex("px"))) null else Double.box(r.getAs[Double]("px")))).toMap
    assert(out(10L) == 101.0) // 1s to 10:05 vs 4:59 back to 10:00
    assert(out(20L) == 101.0) // distance 0 both ways -> backward match
    assert(out(30L) == 102.0) // only a backward candidate exists
    assert(out(40L) == 50.0)  // only a forward candidate exists
    assert(out(50L) == null)
    // equidistant between 10:00 and 10:10 -> backward (pandas rule)
    val mid = Seq(("A", "2024-01-01 10:07:30", 1L)).toDF("sym", "t", "qty")
      .select(col("sym"), to_timestamp(col("t")).as("tts"), col("qty"))
    val tie = AsOfJoin.asOf(mid, quotes, "sym", "tts", "qts", Seq("px"),
      direction = "nearest").head().getAs[Double]("px")
    assert(tie == 101.0, s"equidistant must take the backward match, got $tie")
  }

  test("tolerance nulls out matches farther than the bound, in all directions") {
    // backward: trade at 10:30 is 20 min past the last quote
    val b = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"),
      tolerance = Some(60L * 1000000L)) // 1 minute in micros
      .collect().map(r => r.getAs[Long]("qty") ->
        (if (r.isNullAt(r.fieldIndex("px"))) null else Double.box(r.getAs[Double]("px")))).toMap
    assert(b(10L) == null) // 4:59 back > 1 min
    assert(b(20L) == 101.0) // distance 0
    assert(b(30L) == null) // 20 min back
    // nearest with tolerance: only the within-bound side is eligible
    val n = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"),
      direction = "nearest", tolerance = Some(60L * 1000000L))
      .collect().map(r => r.getAs[Long]("qty") ->
        (if (r.isNullAt(r.fieldIndex("px"))) null else Double.box(r.getAs[Double]("px")))).toMap
    assert(n(10L) == 101.0) // forward 1s within bound; backward 4:59 out
    assert(n(40L) == 50.0)  // forward candidate 1s ahead, within bound
    assert(n(30L) == null)  // both sides out of bound
  }

  test("null field in the latest right row is preserved, not backfilled") {
    // latest quote for A at 10:05 has px=NULL, sz=9; older quote has px=100, sz=5
    val quotes2 = Seq(
      ("A", "2024-01-01 10:00:00", Some(100.0), 5L),
      ("A", "2024-01-01 10:05:00", None, 9L)
    ).toDF("sym", "t", "px", "sz")
      .select(col("sym"), to_timestamp(col("t")).as("qts"), col("px"), col("sz"))
    val trades2 = Seq(("A", "2024-01-01 10:06:00", 1L)).toDF("sym", "t", "qty")
      .select(col("sym"), to_timestamp(col("t")).as("tts"), col("qty"))
    val r = AsOfJoin.asOf(trades2, quotes2, "sym", "tts", "qts", Seq("px", "sz")).head()
    assert(r.isNullAt(r.fieldIndex("px"))) // real NULL from the 10:05 row, not 100.0
    assert(r.getAs[Long]("sz") == 9L)      // both carried cols from the SAME row
  }

  test("output keeps left cardinality and columns plus requested right cols") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("sym", "tts", "qty", "px"))
  }

  test("plan: single exchange on the key, no range join explosion") {
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tts", "qts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2) // one per union branch pre-AQE
  }
}

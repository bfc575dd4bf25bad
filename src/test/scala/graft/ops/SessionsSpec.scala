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
}

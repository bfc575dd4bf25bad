package graft.ops

import org.apache.spark.sql.DataFrame
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
}

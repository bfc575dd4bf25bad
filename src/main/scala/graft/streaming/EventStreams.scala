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

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Tumbling-window count/sum per event_type — shared logic for the
    * batch oracle twin and the streaming query.
    */
  def windowedAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

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

  /** Run a streaming query to completion against bounded input via the
    * memory sink, returning the materialized result table. Used by tests
    * to prove streaming/batch equivalence.
    */
  def runToMemorySink(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}

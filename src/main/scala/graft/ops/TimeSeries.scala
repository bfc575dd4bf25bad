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
}

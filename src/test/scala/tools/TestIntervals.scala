package tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random half-open intervals from hashed ids —
  * the shared fixture generator for `RangeJoinSpec` (small, many-bucket
  * widths) and `tools.StressRange` (1M-scale). Columns are suffixed by
  * `seed` so two sides join without aliasing.
  */
object TestIntervals {
  def intervals(spark: SparkSession, n: Long, seed: Int,
                domain: Long, maxWidth: Long): DataFrame =
    spark.range(n).select(
      col("id").as(s"id$seed"),
      pmod(xxhash64(col("id"), lit(seed)), lit(domain)).as(s"s$seed"),
      (pmod(xxhash64(col("id"), lit(seed)), lit(domain)) +
        pmod(xxhash64(col("id"), lit(seed + 1)), lit(maxWidth))).as(s"e$seed"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the ANALYZE/data-quality pass every warehouse runs
  * before trusting a new feed: per-column row/null/distinct counts and
  * min/max, plus fixed-width value histograms.
  *
  * Both operators are single aggregation passes. [[profile]] computes
  * every column's stats in ONE `agg` (Catalyst plans the multi-distinct
  * via Expand — cost ×(columns+1), which IS the price of exact distinct
  * counts; pass `exact = false` to swap in HLL++ and keep the pass
  * narrow at corpus scale) and unpivots to one row per column, so the
  * result is columns-sized regardless of table size. Bounds cross
  * engines as STRINGS with type-aware formatting — doubles through
  * DECIMAL(18,2) (shortest-double formatting differs between engines;
  * fixed-scale decimal strings do not), timestamps through
  * `yyyy-MM-dd HH:mm:ss`.
  */
object Profiling {

  /** One row per column: (col_name, n_rows, n_non_null, n_distinct,
    * min_val, max_val) with bounds as portable strings.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def fmt(name: String, c: Column): Column = schema(name).dataType match {
      case DoubleType | FloatType => c.cast("decimal(18,2)").cast("string")
      case TimestampType | TimestampNTZType => date_format(c, "yyyy-MM-dd HH:mm:ss")
      case DateType => date_format(c, "yyyy-MM-dd")
      case _ => c.cast("string")
    }
    val aggs = cols.flatMap { name =>
      val c = col(name)
      Seq(
        count(c).as(s"nn_$name"),
        (if (exact) countDistinct(c) else approx_count_distinct(c)).as(s"nd_$name"),
        fmt(name, min(c)).as(s"mn_$name"),
        fmt(name, max(c)).as(s"mx_$name"))
    } :+ count(lit(1)).as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(name =>
        struct(
          lit(name).as("col_name"),
          col("n_rows"),
          col(s"nn_$name").as("n_non_null"),
          col(s"nd_$name").as("n_distinct"),
          col(s"mn_$name").as("min_val"),
          col(s"mx_$name").as("max_val"))): _*)).as("r"))
      .select(col("r.col_name"), col("r.n_rows"), col("r.n_non_null"),
        col("r.n_distinct"), col("r.min_val"), col("r.max_val"))
  }

  /** Fixed-width histogram over a numeric column: one row per occupied
    * bin. The bin index is `floor(value / width)` — floor-of-division
    * (NOT a double→int cast: Spark truncates casts toward zero while
    * other engines round, and negative values would straddle bins), so
    * any engine agrees bin-for-bin. Empty bins are absent by design —
    * at data scale the occupied set is what ships.
    *
    * @return (bin, bin_lo, n, total) — `bin_lo = bin · width`,
    *         `total` an exact DECIMAL sum of the binned values
    */
  def histogram(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.where(col(valueCol).isNotNull)
      .withColumn("bin", floor(col(valueCol) / lit(width.toDouble)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total"))
      .withColumn("bin_lo", col("bin") * width)
      .select(col("bin"), col("bin_lo"), col("n"), col("total"))
  }
}

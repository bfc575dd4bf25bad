package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (multi-dimensional) data layout: rewrite a table sorted by
  * the Morton interleave of two columns, so that file- and
  * row-group-level min-max statistics stay TIGHT in both dimensions —
  * a range predicate on either column then skips most files, where a
  * linear sort serves only its leading column and leaves the other's
  * per-file ranges spanning the whole domain. At 100 TB the layout IS
  * the index: scans prune before they read, with no auxiliary
  * structure to maintain.
  *
  * Mechanics: each clustering column is normalized to [0, 2³²) by
  * linear min-max scaling — the bounds come from one aggregate joined
  * back as a one-row broadcast (never a driver collect). Linear
  * scaling assumes value mass is roughly uniform across the range
  * (true for synthetic keys); heavily skewed columns want RANGE-ID
  * normalization (rank the distinct values, interleave the ranks) —
  * one extra distinct + range join, same write path, documented as the
  * skew variant. Rows are then range-partitioned on the Morton key
  * into `numFiles` output files and sorted within each, so every file
  * owns a contiguous Z-curve segment = a bounded rectangle (pair of
  * bounded intervals) in (a, b) space.
  *
  * The layout changes NOTHING semantically (x19's oracle runs the same
  * filter+aggregate against the unorganized table); [[fileBounds]]
  * exposes the per-file min-max envelope so specs and operators can
  * ASSERT the pruning property instead of trusting it.
  */
object ZOrder {

  /** Write `df` to `path` as parquet, Z-ordered by (`colA`, `colB`). */
  def zorderWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      numFiles: Int): Unit =
    curveWrite(df, colA, colB, path, numFiles, bits = 32,
      graft.functions.InterleaveBits.interleave_bits)

  /** Write `df` to `path` as parquet, HILBERT-ordered by (`colA`,
    * `colB`) — same contract and write path as [[zorderWrite]], tighter
    * locality: the Hilbert curve's unit-step property
    * ([[graft.functions.HilbertIndex]]) means every contiguous key
    * range (= every output file) is a compact blob in (a, b) space,
    * where the Z-curve's per-quadrant diagonal jumps let a
    * boundary-straddling file span half the domain in one dimension
    * (the worst case ZOrderSpec documents for x19). Prefer this for
    * new layouts; zorderWrite stays for parity with Delta/Iceberg
    * `ZORDER BY` semantics.
    */
  def hilbertWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      numFiles: Int): Unit =
    curveWrite(df, colA, colB, path, numFiles,
      bits = graft.functions.HilbertIndex.Order,
      graft.functions.HilbertIndex.hilbert_index)

  private def curveWrite(
      df: DataFrame,
      colA: String,
      colB: String,
      path: String,
      numFiles: Int,
      bits: Int,
      key: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val bounds = df.agg(
      min(col(colA).cast("double")).as("_min_a"),
      max(col(colA).cast("double")).as("_max_a"),
      min(col(colB).cast("double")).as("_min_b"),
      max(col(colB).cast("double")).as("_max_b"))
    val full = (1L << bits) - 1
    def norm(c: String, lo: String, hi: String) =
      least(lit(full), greatest(lit(0L),
        ((col(c).cast("double") - col(lo)) / // degenerate range -> constant 0
          when(col(hi) === col(lo), lit(1.0)).otherwise(col(hi) - col(lo)) *
          lit(full.toDouble)).cast("long")))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", key(
        norm(colA, "_min_a", "_max_a"), norm(colB, "_min_b", "_max_b")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "_min_a", "_max_a", "_min_b", "_max_b")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file [min, max] envelope of `c` over a parquet directory —
    * the observable the Z-order layout exists to shrink. One
    * distributed agg keyed by file name.
    */
  def fileBounds(spark: SparkSession, path: String, c: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** How many files a range predicate `c BETWEEN lo AND hi` must read
    * under the layout at `path` (count of files whose envelope overlaps
    * the query window).
    */
  def filesOverlapping(
      spark: SparkSession, path: String, c: String, lo: Long, hi: Long): Long =
    fileBounds(spark, path, c)
      .where(col("hi") >= lo && col("lo") <= hi)
      .count()
}

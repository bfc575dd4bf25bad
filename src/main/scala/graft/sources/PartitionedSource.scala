package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Hive-style partitioned-directory layout (`path/col=value/…`) — the
  * standard warehouse organization for append-mostly fact data, and the
  * one scan optimization bucketing cannot give: PARTITION PRUNING. A
  * predicate on the partition column eliminates whole directories at
  * PLANNING time — at 100 TB, `WHERE lang = 'en'` over a
  * lang-partitioned corpus reads the `lang=en` tree and nothing else,
  * no file footers touched, no tasks scheduled for the other languages.
  *
  * The two rules this wrapper enforces/documents:
  *
  *   - **Partition by LOW-cardinality, ALWAYS-filtered columns.** Each
  *     distinct value is a directory; a high-cardinality key (doc_id!)
  *     explodes into millions of tiny files — that is what bucketing
  *     ([[Bucketing]]) is for. lang/source/date-style columns are the
  *     fit.
  *   - **Explicit schema on read.** Partition-column VALUES come from
  *     directory names (strings on disk); the passed schema pins their
  *     engine-side type, instead of per-run inference deciding `lang`
  *     is a string today and `date=2024-01-01` is a date tomorrow.
  *     Data-column types come from the parquet footers as usual.
  *
  * Pruning is verified in the spec by asserting the scan's
  * `PartitionFilters` AND that the file count actually shrinks — the
  * plan-level claim and the I/O-level fact.
  */
object PartitionedSource {

  /** Write `df` as zstd parquet partitioned by `partCols` (hive
    * layout). OVERWRITE default = replace-the-export semantics, like
    * [[OrcSource.write]]. The partition columns move to directory
    * names; readers get them back as columns (appended after the data
    * columns — select to restore order).
    */
  def write(
      df: DataFrame,
      path: String,
      partCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partCols.nonEmpty, "partitioned write needs partition columns")
    df.write.mode(mode).partitionBy(partCols: _*)
      .option("compression", "zstd").parquet(path)
  }

  /** Read a partitioned tree with the explicit expected schema (data +
    * partition columns; see object doc for why inference is banned).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}

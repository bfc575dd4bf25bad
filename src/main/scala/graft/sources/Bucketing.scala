package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-located joins without per-query shuffles.
  *
  * At 100 TB the dominant recurring cost of a star-schema workload is
  * re-shuffling the fact table on its join key for every query. Writing
  * the fact (and big dimensions) bucketed by the join key moves that
  * shuffle to write time, once: subsequent equi-joins and aggregations on
  * the bucket key read co-located buckets and plan with ZERO Exchange
  * nodes (verified in [[graft.sources.BucketingSpec]]).
  *
  * Bucket count rules of thumb: target 100-200 MB per bucket file at the
  * expected table size; keep the same count on both sides of a recurring
  * join (Spark only elides the shuffle when bucket specs line up).
  */
object Bucketing {

  /** A crashed earlier run can leave an orphaned table LOCATION with no
    * catalog entry; CREATE TABLE then fails even in overwrite mode —
    * drop the entry and clear the leftover directory first.
    */
  def clearStaleTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val catalog = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
    val loc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Replace a plain managed table, robust to orphaned locations. */
  def replaceTable(df: DataFrame, table: String): Unit = {
    clearStaleTable(df.sparkSession, table)
    df.write.mode("overwrite").saveAsTable(table)
  }

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    clearStaleTable(df.sparkSession, table)
    val w = df.write.mode("overwrite").bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two tables previously bucketed on the same key/count — planner
    * elides both exchanges (sort-merge over co-located buckets).
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}

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
    * catalog entry; CREATE TABLE then fails even in overwrite mode.
    * Clear the DEFAULT location only when no catalog entry exists: a
    * live entry is removed through the catalog (so a table created at a
    * custom/external LOCATION never has an unrelated default-path
    * directory deleted out from under it), and dropping a MANAGED table
    * deletes its own data as part of the drop.
    */
  def clearStaleTable(spark: SparkSession, table: String): Unit = {
    val catalog = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val existed = catalog.tableExists(ident)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!existed) {
      val loc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** Write to a staging table, then swap via retire-rename: the full new
    * write lands in `<table>__staging` first, the live table is RENAMED
    * to `<table>__old` (never dropped while it is the only complete
    * copy), the staging copy takes the live name, and only then is the
    * retired copy dropped. A crash at ANY step leaves at least one
    * complete copy on disk: before the first rename readers still see
    * the old table; between the renames the old data survives under the
    * retired name and the next call restores it before re-staging.
    * ALTER TABLE RENAME preserves the bucket spec and moves the managed
    * location.
    */
  private def writeThenSwap(df: DataFrame, table: String)(
      write: (org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row], String) => Unit): Unit = {
    val spark = df.sparkSession
    val staging = table + "__staging"
    val retired = table + "__old"
    val catalog = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
    def exists(t: String) =
      catalog.tableExists(org.apache.spark.sql.catalyst.TableIdentifier(t))
    // recovery: a retired copy with no live table means a previous swap
    // crashed between its renames — put the survivor back first
    if (!exists(table) && exists(retired))
      spark.sql(s"ALTER TABLE `$retired` RENAME TO `$table`")
    clearStaleTable(spark, retired) // entry AND any orphaned location:
    clearStaleTable(spark, staging) // both renames below need clear paths
    write(df.write.mode("overwrite"), staging)
    if (exists(table)) spark.sql(s"ALTER TABLE `$table` RENAME TO `$retired`")
    else clearStaleTable(spark, table) // clear an orphaned location only
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
    spark.sql(s"DROP TABLE IF EXISTS `$retired`")
  }

  /** Replace a plain managed table, robust to orphaned locations and
    * atomic w.r.t. a crash mid-write (stage-then-swap).
    */
  def replaceTable(df: DataFrame, table: String): Unit =
    writeThenSwap(df, table)((w, t) => w.saveAsTable(t))

  /** Align the writer's partitioning to the bucket layout: repartition
    * and bucketBy share the same hash (Murmur3 pmod numBuckets), so
    * after this each write task owns exactly ONE bucket and emits ONE
    * file. Unaligned, every task opens a parquet writer per bucket it
    * touches — tasks×buckets files per write (measured on the sf0.1
    * IVF index: 31 tasks × 16 buckets, 10.5 executor-CPU-s of writer
    * setup for 2000 rows, then a small-file-bound read back). Write
    * parallelism becomes the bucket count — which the 100-200 MB/bucket
    * sizing rule already fixes at table-size/target-file-size tasks.
    */
  private def alignToBuckets(
      df: DataFrame, bucketCols: Seq[String], numBuckets: Int): DataFrame =
    df.repartition(numBuckets, bucketCols.map(org.apache.spark.sql.functions.col): _*)

  /** Write `df` as a bucketed (and optionally sorted) managed table;
    * stage-then-swap like [[replaceTable]].
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit =
    writeThenSwap(alignToBuckets(df, Seq(bucketCol), numBuckets), table) { (w0, t) =>
      val w = w0.bucketBy(numBuckets, bucketCol)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(t)
    }

  /** Append rows to an EXISTING bucketed table, mirroring the live
    * table's own bucket spec — Spark rejects an append whose spec
    * differs, and inheriting "whatever the session would pick" silently
    * breaks co-location. Appended rows land as additional per-bucket
    * files; readers merge them and bucket pruning keeps working.
    */
  def appendBucketed(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val meta = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalStateException(s"$table is not bucketed — use a plain append"))
    val w = alignToBuckets(df, spec.bucketColumnNames, spec.numBuckets)
      .write.mode("append")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    (spec.sortColumnNames match {
      case s if s.nonEmpty => w.sortBy(s.head, s.tail: _*)
      case _ => w
    }).saveAsTable(table)
  }

  /** Rewrite a bucketed table in place, preserving its spec — the
    * compaction pass for append-grown tables: every [[appendBucketed]]
    * adds one file set per bucket, and after many appends the
    * small-file count dominates scan setup (the classic streaming-sink
    * failure mode). One compact = one read + one bucketed write behind
    * the same stage-then-swap crash safety as the original write; with
    * the bucket-aligned repartition each bucket collapses back to
    * exactly ONE file. Run it on a cadence tied to append count, not
    * time.
    */
  def compactBucketed(spark: SparkSession, table: String): Unit = {
    val meta = org.apache.spark.sql.graft.shims.sessionState(spark).catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalStateException(s"$table is not bucketed — nothing to compact"))
    // Read the table's FILES, not its catalog relation. A bucketed scan
    // advertises HashPartitioning(bucketCols, n), which lets the planner
    // drop the bucket-aligning repartition as redundant — and then
    // DisableUnnecessaryBucketedScan (nothing left exploits the
    // bucketing) reverts to a one-partition-per-FILE scan, so the
    // "compact" rewrites every small file 1:1 instead of folding them
    // (observed: 6 input files → 6 unaligned output files). A path read
    // carries no bucket metadata: the aligning shuffle survives and each
    // bucket collapses to exactly one file. Safe to read lazily:
    // writeThenSwap consumes the plan entirely while writing the STAGING
    // copy — the source directory is only renamed away after that.
    val data = spark.read.schema(meta.schema).parquet(meta.location.toString)
    writeBucketed(data, table, spec.bucketColumnNames.head, spec.numBuckets,
      sortCols = spec.sortColumnNames)
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

package tools

import org.apache.spark.sql.functions._

/** Written-index probe stress — the "probe many times" half of the
  * build-once/write-once artifact flow: a 200k-vector index is built,
  * written bucketed by cell, LOADED back, and probed with 5k queries
  * with auto-broadcast disabled. Asserts (by plan inspection, printed)
  * that the loaded corpus side joins from co-located buckets with no
  * exchange, and that a probed-cell filter prunes to
  * `SelectedBucketsCount` buckets at scan time.
  */
object StressIvfDisk {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "stress-ivf-disk")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress-ivf-disk] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val c = spark.range(200000L)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> cast(sin(xxhash64(id, d)) as float))").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c.count()

    val t0 = System.nanoTime()
    val idx = graft.ops.Similarity.ivfBuild(c, "vec_id", "embedding",
      nCentroids = 64, persist = false)
    graft.ops.Similarity.ivfWrite(idx, "stress_ivf", numBuckets = 32)
    println(f"[stress-ivf-disk] build+write 200k x 64 cells  ${(System.nanoTime() - t0) / 1e9}%8.2fs")

    val loaded = graft.ops.Similarity.ivfLoad(spark, "stress_ivf")
    val q = c.where(col("vec_id") % 40 === 0) // 5k queries
    // warm (plan compile), then measure the loaded-index probe
    graft.ops.Similarity.ivfProbe(loaded, q.limit(10), "vec_id", "embedding", 5, nProbe = 4).count()
    time("probe 5k queries nProbe=4") {
      graft.ops.Similarity.ivfProbe(loaded, q, "vec_id", "embedding", 5, nProbe = 4).count()
    }

    // plan evidence: corpus side never exchanges (bucketed read)
    val probed = graft.ops.Similarity.ivfProbe(loaded, q, "vec_id", "embedding", 5, nProbe = 4)
    probed.count()
    val p = probed.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    println(s"[stress-ivf-disk] probe plan exchanges=$exchanges (expect 2: probes + topk agg)")
    println(s"[stress-ivf-disk] bucketed-scan=${p.contains("Bucketed: true")}")

    // bucket pruning on a cell filter
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val fp = loaded.cells.where(col("cell").isin(1L, 2L, 3L)).queryExecution.executedPlan.toString
    println(s"[stress-ivf-disk] cell-filter pruning=${fp.contains("SelectedBucketsCount")}")

    spark.sql("DROP TABLE IF EXISTS stress_ivf_cells")
    spark.sql("DROP TABLE IF EXISTS stress_ivf_cents")
    spark.stop()
  }
}

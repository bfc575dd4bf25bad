package tools

import org.apache.spark.sql.functions._

/** Range-join stress: 1M × 1M random intervals (width ≤ ~2 buckets)
  * with auto-broadcast DISABLED — the regime where Spark's native plan
  * for a bare overlap predicate is a driver-killing nested loop over
  * 10¹² pairs. The bucketed join's cost is candidate volume
  * (co-bucketed density ≈ n²·meanWidth/domain here), not |L|·|R|.
  */
object StressRange {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val n = 1000000L
    val domain = 100000000L // 1e8 ticks; W=1000 -> 100k buckets
    def intervals(seed: Int) =
      TestIntervals.intervals(spark, n, seed, domain, maxWidth = 2000L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = intervals(1); val b = intervals(3)
    println(s"[stress-range] a=${a.count()} b=${b.count()} intervals, " +
      s"domain=$domain W=1000 (broadcast disabled)")
    val t0 = System.nanoTime()
    val m = graft.ops.RangeJoin.overlapJoin(a, "s1", "e1", b, "s3", "e3", 1000L).count()
    println(f"[stress-range] 1M x 1M overlap join ${(System.nanoTime() - t0) / 1e9}%7.2fs pairs=$m")
    val rt = Runtime.getRuntime
    println(f"[stress-range] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

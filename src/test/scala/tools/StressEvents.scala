package tools

import org.apache.spark.sql.functions._

/** Event-analytics stress: 20M synthetic events over 500k users through
  * the funnel and retention operators. Both are designed as ONE
  * user-keyed shuffle plus bounded finalizes, so wall time must track
  * the shuffle (linear in events), never per-user state or driver
  * memory — this run pins that at 2000× the sf0.01 gate volume.
  */
object StressEvents {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val n = 20000000L
    val users = 500000L
    // deterministic scatter: a fixed multiplicative hash spreads each
    // user's events over a ~120-day span in non-arrival order
    val events = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % users).as("user_id"),
      expr("element_at(array('view','click','purchase','signup','error'), " +
        "cast(pmod(xxhash64(id), 5) as int) + 1)").as("event_type"),
      expr("timestamp_micros(1704067200000000 + pmod(id * 1103515245, 10368000) * 1000000)")
        .as("ts"),
      (col("id") % 100).cast("double").as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress-events] ${events.count()} events, $users users")

    var t0 = System.nanoTime()
    val f = graft.ops.Sessions.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), horizonSeconds = 7L * 86400,
      tieBreak = Seq("event_id")).collect()
    println(f"[stress-events] funnel   ${(System.nanoTime() - t0) / 1e9}%7.2fs  " +
      f.sortBy(_.getInt(0)).map(r => s"${r.getString(1)}=${r.getLong(2)}").mkString(" "))

    t0 = System.nanoTime()
    val r = graft.ops.Sessions.retention(events, "user_id", "ts", "event_type",
      anchorType = "signup", maxWeeks = 16)
    val rows = r.count()
    println(f"[stress-events] retention ${(System.nanoTime() - t0) / 1e9}%6.2fs  cells=$rows")

    val rt = Runtime.getRuntime
    println(f"[stress-events] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

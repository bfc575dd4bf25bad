package tools

import org.apache.spark.sql.functions._

/** Many-query exact-tier stress — the regime the round-3 verdict flagged:
  * a query set far past any sane broadcast (10k × 64-dim) ranked against
  * a 1M-vector corpus, with auto-broadcast DISABLED so the join runs as
  * a partitioned cartesian (the worst case the de-hinted plan can
  * degrade to). Proves:
  *   - bruteForceTopK completes with bounded driver pressure — the
  *     bounded-heap partial agg means the ranking exchange carries
  *     ≤ partitions·|Q|·k buffer rows, never the 10^10 scored pairs;
  *   - embeddingNearDup completes when the corpus exceeds the broadcast
  *     threshold (graceful shuffle degrade, not a driver OOM).
  */
object StressTopK {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val qMod = if (args.length > 1) args(1).toInt else 100
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress-topk] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    def corpus(n: Long) = spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> cast(sin(xxhash64(id, d)) as float))").as("embedding"))

    // ---- v1 regime: n corpus × n/qMod queries, k=5, no broadcast allowed ----
    val c = corpus(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress-topk] corpus=${c.count()} queries=${n / qMod} k=5 (broadcast disabled)")
    val q = c.where(col("vec_id") % qMod === 0)
    time("v1 brute long-id cartesian") {
      graft.ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 5).count()
    }

    // ---- same regime, STRING ids: the string-keyed heap must survive
    //      the identical many-query broadcast-disabled ranking ----
    val cs = c.select(concat(lit("doc-"), col("vec_id").cast("string")).as("vec_id"),
      col("embedding")).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cs.count()
    val qs = cs.where(col("vec_id").endsWith("00"))
    time("v1s brute string-id cartesian") {
      graft.ops.Similarity.bruteForceTopK(cs, qs, "vec_id", "embedding", 5).count()
    }

    // ---- v2 regime: corpus over the broadcast threshold, exact all-pairs ----
    val c2 = corpus(20000L).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    c2.count()
    time("v2 neardup 20k all-pairs") {
      graft.ops.Similarity.embeddingNearDup(c2, "vec_id", "embedding", 0.9).count()
    }

    val rt = Runtime.getRuntime
    println(f"[stress-topk] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

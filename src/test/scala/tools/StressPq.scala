package tools

import org.apache.spark.sql.functions._

/** PQ-tier stress in the StressTopK regime: a large synthetic corpus ×
  * many queries with auto-broadcast DISABLED, comparing the exact
  * bounded-heap tier against the PQ/ADC tier at the same (corpus,
  * queries, k). What this demonstrates:
  *   - the encode pass is linear and narrow (corpus never shuffles);
  *   - ADC scoring replaces dim multiply-adds with m adds per pair, so
  *     the scoring join's CPU drops ~dim/m vs brute force;
  *   - the refine re-rank (|Q|·refine id-keyed join) is noise next to
  *     the scoring pass.
  * Run: sbt "Test/runMain tools.StressPq [corpusN] [queryMod]"
  */
object StressPq {
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

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress-pq] $label%-36s $sec%8.2fs rows=$rows")
      sec
    }
    val c = spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> cast(sin(xxhash64(id, d)) as float))").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress-pq] corpus=${c.count()} queries=${n / qMod} k=5 (broadcast disabled)")
    val q = c.where(col("vec_id") % qMod === 0)

    val tBf = time("exact bounded-heap top-k") {
      graft.ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 5).count()
    }
    // build once: codebook + encoded corpus held like an IVF index
    val cb = graft.ops.Similarity.pqTrain(c, "vec_id", "embedding", m = 16, ksub = 64, iters = 1)
    val enc = graft.ops.Similarity.pqEncode(c, "vec_id", "embedding", cb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pq train+encode (build once)") { enc.count() }
    val tPq = time("pq adc top-k + exact refine") {
      graft.ops.Similarity.pqTopK(c, q, "vec_id", "embedding", 5,
        m = 16, ksub = 64, iters = 1, refine = 100).count()
    }
    println(f"[stress-pq] end-to-end speedup (incl. train) ${tBf / tPq}%.1fx")
    val rt = Runtime.getRuntime
    println(f"[stress-pq] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

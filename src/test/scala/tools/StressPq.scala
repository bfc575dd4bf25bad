package tools

import org.apache.spark.sql.functions._

/** PQ-tier stress in the StressTopK regime: a large synthetic corpus ×
  * many queries with auto-broadcast DISABLED, comparing the exact
  * bounded-heap tier against the PQ/ADC tier at the same (corpus,
  * queries, k). What this demonstrates:
  *   - the encode pass is linear and narrow (corpus never shuffles);
  *   - ADC scoring replaces dim multiply-adds with m adds per pair —
  *     an advantage that GROWS with dim. Measured on this box
  *     (local[32], broadcast disabled): at dim=64 the fused exact
  *     cosine kernel is already per-pair parity (1M×10k: bf 373 s vs
  *     pq 415 s — per-pair join/row overhead dominates both), so the
  *     64-dim win is the 11× smaller scan artifact, not CPU; at
  *     dim=512 the arithmetic ratio shows up in wall time (see
  *     ROUND4_NOTES).
  *   - the refine re-rank (|Q|·refine id-keyed join) is noise next to
  *     the scoring pass.
  * Run: sbt "Test/runMain tools.StressPq [corpusN] [queryMod] [dim]"
  */
object StressPq {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val qMod = if (args.length > 1) args(1).toInt else 100
    val dim = if (args.length > 2) args(2).toInt else 64
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
        expr(s"transform(sequence(0, ${dim - 1}), d -> cast(sin(xxhash64(id, d)) as float))")
          .as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress-pq] corpus=${c.count()} queries=${n / qMod} dim=$dim k=5 (broadcast disabled)")
    val q = c.where(col("vec_id") % qMod === 0)

    // optional 4th arg restricts to one tier (bf|pq|ivfpq), e.g. to
    // re-time a single stage after a plan change
    val only = args.drop(3).headOption
    def stage(name: String)(body: => Double): Double =
      if (only.forall(_ == name)) body else 0.0

    val tBf = stage("bf") {
      time("exact bounded-heap top-k") {
        graft.ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 5).count()
      }
    }
    val tPq = stage("pq") {
      // build once: codebook + encoded corpus held like an IVF index
      val cb = graft.ops.Similarity.pqTrain(c, "vec_id", "embedding", m = 16, ksub = 64, iters = 1)
      val enc = graft.ops.Similarity.pqEncode(c, "vec_id", "embedding", cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("pq train+encode (build once)") { enc.count() }
      time("pq adc top-k + exact refine") {
        graft.ops.Similarity.pqTopK(c, q, "vec_id", "embedding", 5,
          m = 16, ksub = 64, iters = 1, refine = 100).count()
      }
    }
    // prune (IVF cells) × compress (PQ codes): pruning is what buys
    // wall time at low dim, ADC what bounds the per-pair arithmetic
    val tIvfPq = stage("ivfpq") {
      time("ivfpq prune+adc top-k + refine") {
        graft.ops.Similarity.ivfPqTopK(c, q, "vec_id", "embedding", 5,
          nCentroids = 64, nProbe = 8, m = 16, ksub = 64, iters = 1, refine = 100).count()
      }
    }
    if (only.isEmpty)
      println(f"[stress-pq] pq speedup ${tBf / tPq}%.1fx  ivfpq speedup ${tBf / tIvfPq}%.1fx")
    val rt = Runtime.getRuntime
    println(f"[stress-pq] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

package tools

import org.apache.spark.sql.functions._

/** Corpus-scaling probe for the vector tier at a FIXED query budget.
  *
  * The v1/v8/v29 bench entries are recall GATES: their query set is a
  * fixed FRACTION of the corpus (vec_id % 10), so their work grows as
  * queries × corpus — quadratic in SF by construction. That measures the
  * gate, not the engine: a production deployment has a fixed query
  * budget against a growing corpus. This probe runs brute-force top-k
  * and IVF build+probe with a CONSTANT ~200-query set at each SF, so
  * wall/CPU growth isolates the corpus dimension (expected: linear for
  * brute force, near-linear build + sub-linear probe for IVF).
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt -batch "Test/runMain tools.ScaleProbe
  * /root/testdata/sf0.1 /tmp/sf10x /tmp/sf100x"` — one line per
  * (sf, op): wall seconds, executor-CPU seconds, rows.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf10x", "/tmp/sf100x")
    val spark = graft.EngineSession.local("*", "scale-probe",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
        ()
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      // ~200 queries regardless of SF: modulus scales with corpus size
      val qmod = math.max(1L, n / 200L)
      val q = emb.where(col("vec_id") % qmod === 0)
      def timed(name: String)(f: => Long): Unit = {
        val c0 = cpu.get(); val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
        println(f"[scale] $dir%-22s $name%-12s wall=$sec%8.2fs cpu=${(cpu.get() - c0) / 1e9}%8.2fs rows=$rows corpus=$n queries=${n / qmod}")
      }
      timed("brute_topk") {
        graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count()
      }
      timed("ivf_probe") {
        graft.ops.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
          nCentroids = 16, nProbe = 4, kmeansIters = 1).count()
      }
    }
    spark.stop()
  }
}

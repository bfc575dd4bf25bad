package tools

import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the v4 sign-LSH pipeline at sf0.1 —
  * locates the ~33 executor-CPU-seconds the bench attributes to
  * v4_lsh_neardup (2050 vectors, 64 bands × 8 bits).
  */
object ProfileV4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "v4-profile")
    spark.sparkContext.setLogLevel("WARN")
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (s.stageInfo.taskMetrics != null) cpu.addAndGet(s.stageInfo.taskMetrics.executorCpuTime)
        ()
      }
    })
    def time(label: String)(f: => Long): Unit = {
      val c0 = cpu.get(); val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      println(f"[profile-v4] $label%-28s $sec%7.2fs cpu=${(cpu.get() - c0) / 1e9}%7.2fs rows=$n")
    }
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val dup = emb0.where(col("vec_id") < 50).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.1)).as("embedding"))
    val emb = emb0.unionByName(dup).persist()
    time("warm / corpus") { emb.count() }

    // mirror the operator's auto-banding (θ=0.8 × 16 bits → ~445 bands)
    val nBands = graft.ops.Similarity.autoBands(0.8, 16)
    println(s"[profile-v4] auto bands = $nBands x 16 bits")
    val base = emb.where(col("embedding").isNotNull).repartition(32, col("vec_id"))
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    time("sign_bands kernel") {
      base.select(graft.functions.SignBands.sign_bands(col("vec"), nBands, 16).as("k"))
        .select(sum(size(col("k")))).collect(); 2050L
    }
    val banded = base
      .withColumn("keys", graft.functions.SignBands.sign_bands(col("vec"), nBands, 16))
      .select(col("doc_id"), explode(col("keys")).as("band_key"))
    time("banded explode") { banded.count() }
    // same shape as Dedup.bucketCandidates (private): in-bucket (a<b) pairs
    val candidates = banded.as("x")
      .join(banded.withColumnRenamed("doc_id", "doc_id_b").as("y"), Seq("band_key"))
      .where(col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("id_a"), col("doc_id_b").as("id_b"))
      .distinct()
    time("bucket candidates") { candidates.count() }
    time("full v4 cold") {
      graft.ops.Similarity.lshEmbeddingNearDup(emb, "vec_id", "embedding", 0.8).count()
    }
    time("full v4 warm") {
      graft.ops.Similarity.lshEmbeddingNearDup(emb, "vec_id", "embedding", 0.8).count()
    }
    spark.stop()
  }
}

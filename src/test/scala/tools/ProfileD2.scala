package tools

import org.apache.spark.sql.functions._

/** Stage-by-stage cost breakdown of the d2 minhash pipeline at sf0.1 —
  * wall AND executor-CPU per stage, to locate the ~30 CPU-seconds the
  * bench attributes to d2_minhash_neardup.
  */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d2-profile")
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
      println(f"[profile] $label%-18s $sec%7.2fs cpu=${(cpu.get() - c0) / 1e9}%7.2fs rows=$n")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("warm session") { docs.count() }

    time("shingles only") {
      docs.where(col("text").isNotNull).repartition(32, col("doc_id"))
        .select(graft.functions.NGramShingles.ngram_shingles(col("text"), 3).as("sh"))
        .select(sum(org.apache.spark.sql.functions.size(col("sh")))).collect()
      5000L
    }
    for (i <- 1 to 2) time(s"signatures #$i") {
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }
    // the pipeline's intermediate stages, built EXACTLY like minhashNearDup
    val sigs = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text")
      .persist()
    time("sigs persist") { sigs.count() }
    val banded = sigs.select(col("doc_id"),
      posexplode_outer(graft.functions.MinHash.bands_from_sig(col("sig"), 32))
        .as(Seq("band_idx", "band_key")))
    time("banded explode") { banded.count() }
    // same shape as Dedup.bucketCandidates (private): in-bucket (a<b) pairs
    val cand = banded.as("x")
      .join(banded.withColumnRenamed("doc_id", "doc_id_b").as("y"), Seq("band_idx", "band_key"))
      .where(col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("id_a"), col("doc_id_b").as("id_b"))
      .distinct()
    time("candidates") { cand.count() }
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    time("candIds") { candIds.count() }
    val needed = sigs.join(candIds, Seq("doc_id"), "left_semi")
    time("needed semi") { needed.count() }
    val threshold = 0.8
    val margin = 6.0 * math.sqrt(threshold * (1.0 - threshold) / 128)
    val prefiltered = cand
      .join(needed.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(needed.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("id_b"))
      .where(graft.functions.MinHash.sig_overlap(col("sig_a"), col("sig_b")) >= threshold - margin)
    time("pair join+sig") { prefiltered.select("id_a", "id_b").count() }
    time("verify jaccard") {
      prefiltered
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .where(col("jaccard") >= threshold).count()
    }
    sigs.unpersist()
    time("pairs cold (full)") {
      graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}

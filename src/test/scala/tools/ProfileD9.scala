package tools

import org.apache.spark.sql.functions._

/** Stage-by-stage cost of the d9 Bloom decontamination at sf0.1: the
  * bench charges it ~8 CPU-s where d7 (broadcast-distinct) pays 0.3 —
  * localize whether the cost is the shingle kernel, the xxhash+probe,
  * or the 16 MB filter VALUE being copied through the join output rows.
  */
object ProfileD9 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d9-profile")
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
      println(f"[profile] $label%-28s $sec%7.2fs cpu=${(cpu.get() - c0) / 1e9}%7.2fs rows=$n")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val train = docs.where(col("doc_id") >= 20)
    val eval = docs.where(col("doc_id") < 20)
    time("warm") { docs.count() }

    import graft.functions.Bloom
    val numBits = 1 << 27
    val numHashes = 7
    time("train shingles explode") {
      train.select(col("doc_id"),
        explode(graft.functions.NGramShingles.ngram_shingles(col("text"), 8)).as("g"))
        .count()
    }
    time("  + xxhash64 only") {
      train.select(col("doc_id"),
        explode(graft.functions.NGramShingles.ngram_shingles(col("text"), 8)).as("g"))
        .select(bit_xor(xxhash64(col("g")))).collect()
      1L
    }
    val eg = eval
      .select(explode(graft.functions.NGramShingles.ngram_shingles(col("text"), 8)).as("g"))
      .distinct()
    val filt = eg.agg(Bloom.bloom_agg(xxhash64(col("g")), numBits, numHashes).as("bf"))
    time("bloom build") { filt.count() }
    val tg = train.select(col("doc_id"),
      explode(graft.functions.NGramShingles.ngram_shingles(col("text"), 8)).as("g"))
    // the old crossJoin formulation, kept for the before/after numbers
    // (NOTE at 1<<27 bits this is ~16 MB memcpy PER PROBED ROW — only
    // run it at the query's 1<<20 sizing)
    time("crossJoin+where (old)") {
      tg.crossJoin(broadcast(
        eg.agg(Bloom.bloom_agg(xxhash64(col("g")), 1 << 20, numHashes).as("bf")))
      ).where(Bloom.bloom_contains(col("bf"), xxhash64(col("g"))))
        .select(col("doc_id"), col("g"))
        .count()
    }
    time("scalar-subquery probe (new)") {
      tg.where(Bloom.bloom_contains(
        org.apache.spark.sql.graft.shims.scalarSubquery(
          eg.agg(Bloom.bloom_agg(xxhash64(col("g")), 1 << 20, numHashes).as("bf"))),
        xxhash64(col("g"))))
        .select(col("doc_id"), col("g"))
        .count()
    }
    for (i <- 1 to 2) time(s"full d9 #$i") {
      graft.ops.Corpus.decontaminateBloom(train, eval, "doc_id", "text").count()
    }
    time("full d7") {
      graft.ops.Corpus.decontaminate(train, eval, "doc_id", "text").count()
    }
    spark.stop()
  }
}

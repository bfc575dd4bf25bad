package tools

import org.apache.spark.sql.functions._

/** Written band-index stress — the "probe many times" half of the text
  * near-dup artifact flow (d11): a synthetic 100k-doc history with
  * injected near-duplicates is signed, banded, and written bucketed
  * ONCE, then LOADED back and probed repeatedly with auto-broadcast
  * disabled. What this pins:
  *   - probes pay ZERO history kernel cost (no shingle/minhash pass
  *     over the corpus after the build);
  *   - the loaded band join reads co-located buckets with no
  *     corpus-side exchange (counted from the plan);
  *   - repeated probes are flat (no per-call warm-up), and the flagged
  *     pair count matches the injected duplicate construction.
  * Run: sbt "Test/runMain tools.StressBandIndex [historyN] [probeN]"
  */
object StressBandIndex {
  def main(args: Array[String]): Unit = {
    val histN = if (args.nonEmpty) args(0).toLong else 100000L
    val probeN = if (args.length > 1) args(1).toLong else 10000L
    val spark = graft.EngineSession.local("32", "stress-band-index")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress-band] $label%-34s $sec%8.2fs rows=$rows")
      sec
    }
    // synthetic docs: ~25 distinct-ish words each from a doc-keyed hash
    // stream; every 20th PROBE doc is an exact copy of a history doc
    // (jaccard 1.0 — guaranteed flagged), the rest are unique
    def mkDocs(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("doc_id"),
      expr("""array_join(transform(sequence(0, 24),
        w -> conv(cast(pmod(xxhash64(seed, w), 1048576) as string), 10, 36)), ' ')""")
        .as("text"))
    val history = mkDocs(spark.range(histN)
      .select(col("id").as("doc_id"), col("id").as("seed")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[stress-band] history=${history.count()} probes=$probeN (broadcast disabled)")
    val probes = mkDocs(spark.range(probeN)
      .select((col("id") + 10000000L).as("doc_id"),
        when(col("id") % 20 === 0, col("id")) // copy of history doc `id`
          .otherwise(col("id") + 20000000L).as("seed")))

    // paid ONCE: sign, band, write bucketed
    time("build+write index (once)") {
      graft.streaming.CorpusStreams.indexHistory(
        history, "doc_id", "text", "stress_band_idx",
        numBuckets = 32)
      histN
    }
    val idx = graft.streaming.CorpusStreams.loadIndex(spark, "stress_band_idx")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val expected = probeN / 20
    var lastPlan = ""
    for (i <- 1 to 3) time(s"probe #$i (loaded, no rebuild)") {
      val out = graft.streaming.CorpusStreams.nearDupVsIndex(
        probes, idx, "doc_id", "text", 0.8)
      val rows = out.count()
      lastPlan = out.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      require(rows == expected, s"expected $expected injected dups, got $rows")
      rows
    }
    val exchanges = "Exchange hashpartitioning".r.findAllIn(lastPlan).length
    val bucketed = "Bucketed: true".r.findAllIn(lastPlan).length
    println(s"[stress-band] probe plan: $exchanges probe-side exchanges, " +
      s"$bucketed bucket-aware history scans (corpus never shuffles)")
    require(exchanges == 2 && bucketed == 2, "corpus-side shuffle leaked")
    Seq("_sigs", "_bands", "_meta").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS stress_band_idx$s"))
    spark.stop()
  }
}

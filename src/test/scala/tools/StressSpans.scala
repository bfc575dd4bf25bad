package tools

import org.apache.spark.sql.functions._

/** Character-level dedup stress — the honest ×textLen fan-out of
  * ExactSubstr measured at scale: 100k synthetic docs × ~1 kB, ~25% of
  * them carrying one of 200 shared boilerplate passages, ≈ 100M gram
  * rows through the occurrence-rank shuffle. Proves the two-exchange
  * plan completes on local[32] with bounded memory (the exchange
  * carries (16-byte digest, doc, pos) — never text), and reports the
  * gram-row throughput to size cluster runs.
  */
object StressSpans {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val nDocs = 100000L
    val L = 50
    // ~1 kB body, unique per doc (hash-seeded words); every 4th doc
    // appends one of 200 shared ~200-char passages
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(
        // unique body: 120 pseudo-random words from the doc id
        concat_ws(" ", expr(
          "transform(sequence(0, 119), w -> conv(xxhash64(id, w), 10, 36))")),
        when(col("id") % 4 === 0,
          concat(lit(" SHARED"),
            concat_ws(" ", expr(
              "transform(sequence(0, 23), w -> conv(xxhash64(id % 200, w, 7777), 10, 36))"))))
          .otherwise(lit(""))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = docs.agg(count(lit(1)), avg(length(col("text"))),
      sum(length(col("text")))).head
    val gramRows = stats.getLong(2) - nDocs * (L - 1)
    println(f"[stress-spans] docs=${stats.getLong(0)} avgLen=${stats.getDouble(1)}%.0f " +
      f"gramRows≈${gramRows / 1e6}%.0fM L=$L")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[stress-spans] $label%-28s $secs%8.2fs rows=$n " +
        f"(${gramRows / secs / 1e6}%.1fM grams/s)")
    }

    time("repeatedSpans 100k x 1kB") {
      graft.ops.Dedup.repeatedSpans(docs, "doc_id", "text", L).count()
    }
    time("cutRepeatedSpans same corpus") {
      graft.ops.Dedup.cutRepeatedSpans(docs, "doc_id", "text", L)
        .agg(sum(length(col("text")))).head.getLong(0)
    }

    val rt = Runtime.getRuntime
    println(f"[stress-spans] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

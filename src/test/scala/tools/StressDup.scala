package tools

import org.apache.spark.sql.functions._

/** Duplicate-heavy stress: a corpus where HALF the docs are copies — the
  * realistic worst case for a dedup pipeline, and exactly the case where
  * a forced broadcast of the candidate-id set would OOM the driver
  * (candidates ≈ corpus). Proves minhashNearDup + connectedComponents
  * complete with bounded driver pressure now that the broadcast decision
  * is AQE's.
  */
object StressDup {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "stress-dup")
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    // 50%-dup corpus: every doc appears twice (ids offset by 1M)
    val corpus = base.unionByName(
      base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress-dup] $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val nDocs = corpus.count()
    println(s"[stress-dup] corpus docs=$nDocs (50% duplicates)")
    time("pairs") {
      graft.ops.Dedup.minhashNearDup(corpus, "doc_id", "text", 0.8).count()
    }
    time("components") {
      val pairs = graft.ops.Dedup.minhashNearDup(corpus, "doc_id", "text", 0.8)
      graft.ops.Dedup.connectedComponents(pairs).count()
    }
    println(s"[stress-dup] cc rounds=${graft.ops.Dedup.lastConvergenceRounds}")
    val rt = Runtime.getRuntime
    println(f"[stress-dup] driver heap used=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}

package tools

/** Stage-by-stage cost breakdown of the d2 minhash pipeline at sf0.1. */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d2-profile")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    time("warm session") { docs.count() }
    for (i <- 1 to 3) time(s"signatures #$i") {
      graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text").count()
    }
    // shingles only (no minhash): isolates the shingling vs hashing cost
    time("shingles only") {
      import org.apache.spark.sql.functions._
      docs.where(col("text").isNotNull).repartition(32, col("doc_id"))
        .select(graft.functions.NGramShingles.ngram_shingles(col("text"), 3).as("sh"))
        .select(sum(org.apache.spark.sql.functions.size(col("sh")))).collect()
      5000L
    }
    time("pairs cold") {
      graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}

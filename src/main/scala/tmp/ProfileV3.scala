package tmp

import org.apache.spark.sql.functions._

/** v1 vs v3 stage-level timing at a scale factor. */
object ProfileV3 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb
    // warm everything once
    graft.ops.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5).count()
    graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count()

    time("v1 full")(graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count())

    val t0 = System.nanoTime()
    val idx = graft.ops.Similarity.ivfBuild(emb, "vec_id", "embedding")
    time("v3 build")(idx.cells.count())
    time("v3 probe")(graft.ops.Similarity.ivfProbe(idx, q, "vec_id", "embedding", 5).count())
    time("v3 probe2")(graft.ops.Similarity.ivfProbe(idx, q, "vec_id", "embedding", 5).count())
    println(f"[profile] v3 build+probe total ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    idx.unpersist()
    spark.stop()
  }
}

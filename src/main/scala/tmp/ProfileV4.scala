package tmp

import org.apache.spark.sql.functions._

object ProfileV4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "v3-recall")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         (np, ki) <- Seq((8, 0), (8, 1), (6, 1), (4, 1))) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.where(col("vec_id") % 10 === 0)
      val bf = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val ivf = graft.ops.Similarity.ivfTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = np, kmeansIters = ki)
        .select("query_id", "neighbor_id")
      val nBf = bf.count()
      val nHit = bf.join(ivf, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"[cmp] $dir nProbe=$np ki=$ki recall=${nHit.toDouble / nBf}")
    }
    spark.stop()
  }
}

package tools
import org.apache.spark.sql.functions._
object ProfileV29 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("16", "profile-v29",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val emb = spark.read.parquet(args.headOption.getOrElse("/root/testdata/sf0.01") + "/embeddings.parquet")
    val q = emb.where(col("vec_id") % 10 === 0)
    val bf = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
    for (rr <- Seq(50, 100, 200, 400)) {
      val bq = graft.ops.Similarity.ivfBqTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = 8, rerank = rr, kmeansIters = 1)
        .select("query_id", "neighbor_id")
      val hit = bf.join(bq, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(s"[profile-v29] rerank=$rr recall=${hit.toDouble / bf.count()}")
    }
    spark.stop()
  }
}

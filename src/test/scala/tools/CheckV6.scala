package tools

import org.apache.spark.sql.functions._

/** Gate check + operating-point sweep for the PQ recall query (v6).
  *
  * `Test/runMain tools.CheckV6` runs the shipped v6 gate at sf0.01 and
  * sf0.1; `Test/runMain tools.CheckV6 sweep` additionally measures raw
  * PQ recall vs brute force across (m, ksub, refine) — how the shipped
  * m=16 × ksub=64 × refine=100 point was chosen (recall 1.000 at
  * sf0.01, 0.986 at sf0.1 on this weakly clustered corpus; 8×32×50
  * measured 0.53–0.77, too close to the 0.7 gate).
  */
object CheckV6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "check-v6")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val row = graft.SparkEntry.queries("v6_pq_recall")(spark, dir).collect().head
      println(f"[check-v6] $dir v6_pq_recall n_bf=${row.getLong(0)} " +
        f"recall_ok=${row.getInt(1)} ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      assert(row.getInt(1) == 1, s"v6 recall gate FAILED at $dir")

      if (args.contains("sweep")) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val q = emb.where(col("vec_id") % 10 === 0)
        val bf = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
          .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
        for ((np, refine) <- Seq((8, 100), (12, 100), (8, 200))) {
          val t1 = System.nanoTime()
          val ivfpq = graft.ops.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
            nCentroids = 16, nProbe = np, m = 16, ksub = 64, iters = 1, refine = refine)
            .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
          val recall = ivfpq.intersect(bf).size.toDouble / bf.size
          println(f"[check-v6] $dir ivfpq nProbe=$np%2d refine=$refine%3d " +
            f"recall=$recall%.3f ${(System.nanoTime() - t1) / 1e9}%6.2fs")
        }
        for ((m, ksub, refine) <- Seq((8, 32, 50), (8, 32, 100), (8, 64, 50),
            (16, 32, 50), (8, 32, 200), (16, 64, 100))) {
          val t1 = System.nanoTime()
          val pq = graft.ops.Similarity.pqTopK(emb, q, "vec_id", "embedding", 5,
            m = m, ksub = ksub, iters = 1, refine = refine)
            .select("query_id", "neighbor_id").collect().map(_.toSeq).toSet
          val recall = pq.intersect(bf).size.toDouble / bf.size
          println(f"[check-v6] $dir m=$m%2d ksub=$ksub%2d refine=$refine%3d " +
            f"recall=$recall%.3f ${(System.nanoTime() - t1) / 1e9}%6.2fs")
        }
      }
    }
    println("[check-v6] all gates green")
    spark.stop()
  }
}

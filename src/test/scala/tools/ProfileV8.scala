package tools

import org.apache.spark.sql.functions._

/** Stage-level timing of the v8 gate (ivfPqBuild → write → load → probe
  * vs brute baseline) at one SF dir — finds which stage eats the wall
  * when the gate slows at scale-ups. Run:
  * `SPARK_DRIVER_MEM=48g sbt -batch "Test/runMain tools.ProfileV8 /tmp/sf100x [budget]"`
  */
object ProfileV8 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf100x"
    val budget = if (args.length > 1) Some(args(1).toLong) else None
    val spark = graft.EngineSession.local("*", "profile-v8",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v8prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qAll = emb.where(col("vec_id") % 10 === 0)
    val q = budget.map(b => qAll.where(col("vec_id") < 10L * b)).getOrElse(qAll)
    println(s"[v8prof] corpus=${emb.count()} queries=${q.count()}")
    val idx = time("ivfPqBuild+materialize") {
      val i = graft.ops.Similarity.ivfPqBuild(
        emb, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
        iters = 1, persist = false)
      i.cells.count()
      i
    }
    time("ivfPqWrite") {
      graft.ops.Similarity.ivfPqWrite(idx, "graft_v8prof_index")
    }
    val loaded = time("ivfPqLoad") {
      graft.ops.Similarity.ivfPqLoad(spark, "graft_v8prof_index")
    }
    val probe = time("ivfPqProbe(count)") {
      val p = graft.ops.Similarity.ivfPqProbe(loaded, q, "vec_id", "embedding", 5,
        nProbe = 12, refine = 100, refineWith = Some(emb))
      p.count(); p
    }
    val brute = time("bruteForceTopK(count)") {
      val b = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      b.count(); b
    }
    time("recallGate(collect)") {
      val bf = brute.select("query_id", "neighbor_id")
      val hit = bf.join(probe.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .collect().foreach(r => println(s"[v8prof] gate row: $r"))
    }
    spark.stop()
  }
}

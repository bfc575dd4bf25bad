package tools

import org.apache.spark.sql.functions._

/** CPU-attribution probe for the v7 in-memory IVF-PQ recall gate.
  *
  * The r8 canonical bench put v7_ivfpq_recall at ~80-190 executor-CPU-s
  * while v8 (same probe path over a LOADED index) sits under 10 — this
  * tool decomposes the gate to find the sink: it times (a) the brute
  * side alone, (b) build alone, (c) probe over a held index, (d) the
  * full recallGate composition, printing executor-CPU per step and the
  * formatted plan of the scoring join so a pq_lut that collapsed back
  * into the per-pair join (the r8 plan bug ivfPqProbe materializes
  * probes to prevent) is visible as a missing InMemoryRelation.
  *
  * Run: `sbt -batch "Test/runMain tools.ProfileV7 /root/testdata/sf0.1"`
  */
object ProfileV7 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.EngineSession.local("*", "profile-v7",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
        ()
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect() // warm

    def step(name: String)(f: => Long): Unit = {
      val c0 = cpu.get(); val t0 = System.nanoTime()
      val rows = f
      val w = (System.nanoTime() - t0) / 1e9
      val c = (cpu.get() - c0) / 1e9
      println(f"[v7prof] $name%-28s wall=$w%7.2fs cpu=$c%8.2fs rows=$rows")
    }

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") % 10 === 0)
    emb.persist(); emb.count()

    step("brute_force") {
      graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count()
    }
    step("build_only") {
      val idx = graft.ops.Similarity.ivfPqBuild(
        emb, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
        iters = 1, persist = true)
      val n = idx.cells.count()
      idx.unpersist()
      n
    }
    val idx = graft.ops.Similarity.ivfPqBuild(
      emb, "vec_id", "embedding", nCentroids = 16, m = 16, ksub = 64,
      iters = 1, persist = true)
    idx.cells.count()
    step("probe_held_index") {
      graft.ops.Similarity.ivfPqProbe(idx, q, "vec_id", "embedding", 5,
        nProbe = 12, refine = 100, refineWith = Some(emb)).count()
    }
    println("=== scoring-join plan (held index) ===")
    graft.ops.Similarity.ivfPqProbe(idx, q, "vec_id", "embedding", 5,
      nProbe = 12, refine = 100, refineWith = Some(emb)).explain("formatted")
    idx.unpersist()

    step("one_shot_topk") {
      graft.ops.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = 12, m = 16, ksub = 64, iters = 1,
        refine = 100).count()
    }
    step("full_gate_as_benched") {
      val bf = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id")
      val ap = graft.ops.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
        nCentroids = 16, nProbe = 12, m = 16, ksub = 64, iters = 1, refine = 100)
        .select("query_id", "neighbor_id")
      val hit = bf.join(ap, Seq("query_id", "neighbor_id"), "left_semi")
      bf.agg(count(lit(1)).as("n_bf"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit"))).count()
    }
    println("=== one-shot topk plan ===")
    graft.ops.Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 5,
      nCentroids = 16, nProbe = 12, m = 16, ksub = 64, iters = 1,
      refine = 100).explain("formatted")
    spark.stop()
  }
}

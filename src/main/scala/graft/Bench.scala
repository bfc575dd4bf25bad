package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core (the driver may not set SPARK_GRAFT_CPUS);
    // ONE session bootstrap (EngineSession) — see Verify
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val spark = EngineSession.local(cpus, "graft-bench",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"),
      inputDir = Some(sfDir))
    // Warm the JVM/codegen/FS paths so the first measured query isn't
    // charged for session bring-up (~5s of JIT + parquet footer reads).
    // Fixed, named warm-up query (the sorted-first one): an arbitrary
    // Map.head would give a random query a warm-JIT advantage and make
    // per-query timings incomparable across runs.
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("a1_full_agg")(spark, sfDir).count() catch { case _: Throwable => }
    // Per-query Spark JOB counts: iterative operators (connected
    // components) cost one job per round plus actions — the count makes
    // a round-reduction provable in the bench output instead of arguing
    // from wall-clock on a possibly-loaded machine.
    val jobCounter = new java.util.concurrent.atomic.AtomicLong()
    // Executor-CPU nanos per query (summed over completed stages): wall
    // time on a shared box is load-dominated — the round-3 recording had
    // 9x wall outliers that a rerun on an idle machine erased — while
    // CPU totals are stable across load, so verdicts can compare cpu
    // instead of wall noise.
    val cpuCounter = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpuCounter.addAndGet(m.executorCpuTime)
        ()
      }
    })
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_BENCH_ONLY=a1_full_agg,g1_pagerank,... restricts the run —
    // the 100×-scaling headline bench uses this (running all ~260 queries at
    // 100× measures the oracle harness's patience, not the engine)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    }
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1).map { case (name, fn) =>
      val j0 = jobCounter.get()
      val c0 = cpuCounter.get()
      val t0 = System.nanoTime()
      val n = try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async: drain the bus (outside the timed
      // window) so the delta is attributable to this query even when a
      // loaded dispatch thread lags
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      val jobs = jobCounter.get() - j0
      val cpu = (cpuCounter.get() - c0) / 1e9
      System.err.println(f"[bench] $name%-22s $sec%8.2fs  cpu=$cpu%8.2fs rows=$n jobs=$jobs")
      (name, sec, jobs, cpu)
    }
    def numMap(pairs: Seq[(String, Any)]): String =
      pairs.map { case (k, v) => JsonUtil.quote(k) + ":" + v }.mkString("{", ",", "}")
    val qs = numMap(results.map { case (k, v, _, _) => k -> v })
    val js = numMap(results.map { case (k, _, j, _) => k -> j })
    // rint/1000, NOT f"%.3f": the f-interpolator formats with the JVM
    // default locale, so a comma-decimal locale would emit "57,600" and
    // corrupt the JSON; Double.toString is locale-independent
    val cs = numMap(results.map { case (k, _, _, c) => k -> math.rint(c * 1000) / 1000 })
    val total = results.map(_._2).sum
    val totalCpu = results.map(_._4).sum
    // failed queries must be visible in the machine-readable line, not
    // just stderr — a time-to-exception would otherwise read as a speedup
    val errJson = errors
      .map { case (k, v) => s"${JsonUtil.quote(k)}:${JsonUtil.quote(v)}" }
      .mkString("{", ",", "}")
    // self-describing keys (the r5 post-mortem: a loaded-box tail capture
    // read the cpu map as wall time): per-query WALL seconds live under
    // "queries" (the driver contract) and the cpu map is named
    // "cpu_secs"; the wall map goes LAST so a truncated tail capture
    // ends with wall, not cpu
    val json = s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$totalCpu,"cpu_secs":$cs,"jobs":$js,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir","queries":$qs}"""
    // Belt and braces for the driver's tail capture: the round-3 artifact
    // was truncated mid-line on a loaded box ("parsed": null), losing the
    // per-query map. The file copy survives any stdout truncation.
    try {
      new java.io.File("target").mkdirs()
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), json)
      System.err.println("[bench] full JSON also at target/bench.json")
    } catch { case _: Exception => () }
    println(json)
    spark.stop()
  }
}

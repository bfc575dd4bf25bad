package tools

/** Cluster-shape validation of the partition-sizing claim (VERDICT r8
  * item 4): run one SparkEntry query on `local-cluster[W,C,M]` — REAL
  * executor JVMs with their own heaps and a real shuffle service path,
  * unlike local[32]'s single shared heap — and print the same
  * wall/cpu/shuffle/spill line as [[ProfileSpill]], so SCALING.md's
  * "the same key-partitioned shuffles spread on a real cluster"
  * assertion is measured, not argued.
  *
  * Shuffle partitions default to the SAME input-byte derivation the
  * EngineSession autosizer ships (max(total cores, bytes/128 MiB)), so
  * the probe validates the rule a cluster user would actually get.
  *
  * Run: `SPARK_DRIVER_MEM=16g SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt -batch "Test/runMain tools.ClusterProbe g1_pagerank /tmp/sf10x 4 8 8192 [parts]"`
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val workers = if (args.length > 2) args(2).toInt else 4
    val cores = if (args.length > 3) args(3).toInt else 8
    val memMb = if (args.length > 4) args(4).toInt else 8192
    val parts = if (args.length > 5) args(5).toInt
      else graft.EngineSession.derivePartitions(workers * cores,
        graft.EngineSession.dirBytes(dir))
    val cp = Seq("/root/repo/target/scala-2.13/classes",
      "/root/repo/target/scala-2.13/test-classes").mkString(":")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local-cluster[$workers,$cores,$memMb]")
      .appName("cluster-probe")
      // Executors do NOT inherit the worker grant: with the key unset,
      // local-cluster launches 1024 MiB executor JVMs regardless of M
      // (measured r10 — the r9 table's "8 GiB executors" were really
      // 1 GiB ones). Stamp it so the probe shape means what it says and
      // the memory-aware operators (Similarity.executorMemoryBytes) see
      // the real grant.
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.executor.extraJavaOptions", FaultInject.openStr)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val sc = spark.sparkContext
    while (sc.getExecutorMemoryStatus.size < workers + 1) Thread.sleep(200)
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    val spillMem = new java.util.concurrent.atomic.AtomicLong()
    val spillDisk = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val gc = new java.util.concurrent.atomic.AtomicLong()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          cpu.addAndGet(m.executorCpuTime)
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          gc.addAndGet(m.jvmGCTime)
        }
        ()
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(query)(spark, dir).count()
    val w = (System.nanoTime() - t0) / 1e9
    println(f"[clusterprobe] $query shape=${workers}x${cores}x${memMb}MB parts=$parts " +
      f"wall=$w%.1fs cpu=${cpu.get() / 1e9}%.1fs gc=${gc.get() / 1e3}%.1fs rows=$n " +
      f"shufRead=${shufRead.get() / 1e9}%.2fGB shufWrite=${shufWrite.get() / 1e9}%.2fGB " +
      f"spillMem=${spillMem.get() / 1e9}%.2fGB spillDisk=${spillDisk.get() / 1e9}%.2fGB")
    spark.stop()
  }
}

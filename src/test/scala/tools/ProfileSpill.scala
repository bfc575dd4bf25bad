package tools

/** Spill/shuffle attribution for a named SparkEntry query at any SF dir.
  *
  * The 1000x headline showed the graph tier's CPU growing ~15-18x per
  * 10x of data (linear would be 10x): this tool runs one query and
  * prints executor CPU, shuffle read/write bytes, and memory/disk spill
  * summed over stages, so partition-sizing hypotheses are measured, not
  * argued. Optional second arg overrides spark.sql.shuffle.partitions.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt -batch
  *   "Test/runMain tools.ProfileSpill g1_pagerank /tmp/sf1000x [128]"`
  */
object ProfileSpill {
  def main(args: Array[String]): Unit = {
    val query = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val parts = if (args.length > 2) Some(args(2)) else None
    // inputDir wired so a no-arg run exercises the autosized default;
    // an explicit parts arg still wins (extraConfs override the base)
    val spark = graft.EngineSession.local("*", "profile-spill",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true") ++
        parts.map("spark.sql.shuffle.partitions" -> _).toMap,
      inputDir = Some(dir))
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    val spillMem = new java.util.concurrent.atomic.AtomicLong()
    val spillDisk = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val gc = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
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
    println(f"[spillprof] $query parts=${parts.getOrElse("default")} " +
      f"wall=$w%.1fs cpu=${cpu.get() / 1e9}%.1fs gc=${gc.get() / 1e3}%.1fs rows=$n " +
      f"shufRead=${shufRead.get() / 1e9}%.2fGB shufWrite=${shufWrite.get() / 1e9}%.2fGB " +
      f"spillMem=${spillMem.get() / 1e9}%.2fGB spillDisk=${spillDisk.get() / 1e9}%.2fGB")
    spark.stop()
  }
}

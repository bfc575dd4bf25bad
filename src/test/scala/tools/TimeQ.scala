package tools

/** Scratch: time individual SparkEntry queries on a given SF dir. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("w1_window_dedup")
    val spark = graft.EngineSession.local("*", "timeq",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    spark.range(1000).selectExpr("sum(id)").collect()
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
        ()
      }
    })
    for (n <- names; i <- 1 to 2) {
      val c0 = cpu.get()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      println(f"[timeq] $n run$i $sec%.2fs cpu=${(cpu.get() - c0) / 1e9}%.2fs rows=$c")
    }
    spark.stop()
  }
}

package tools

/** Time any SparkEntry queries in a fresh JVM:
  * `Test/runMain tools.TimeQuery q1 q2 ...` against SPARK_GRAFT_SF_DIR
  * (default sf0.1). Prints wall AND executor-CPU seconds per pass (two
  * passes per query — pass1 carries JIT/codegen warmup).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "time-query",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { q =>
      for (pass <- 1 to 2) {
        org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
        val c0 = cpu.get()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
        println(f"[time-query] $q%-24s pass$pass wall=$wall%7.2fs " +
          f"cpu=${(cpu.get() - c0) / 1e9}%7.2fs rows=$n")
      }
    }
    spark.stop()
  }
}

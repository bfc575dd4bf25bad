package tools

import org.apache.spark.sql.functions._

/** Minimal reproducer for the per-task CPU overhead seen on 32-task
  * stages over small cached relations: caches a tiny DF at an explicit
  * 32-way partitioning, then loops an aggregate over it, printing
  * executor-CPU per pass. `Test/runMain tools.ProbeCache [nRows]`.
  */
object ProbeCache {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = graft.EngineSession.local("32", "probe-cache")
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
      }
    })
    println(s"[probe] pid=${ProcessHandle.current().pid()}")
    val df = spark.range(n).select(col("id"), (col("id") % 97).as("k"))
      .repartition(32, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    for (i <- 1 to 60) {
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      val c0 = cpu.get()
      val t0 = System.nanoTime()
      df.groupBy("k").agg(sum("id")).where(col("k") === 0).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      println(f"[probe] pass$i wall=$wall%.3fs cpu=${(cpu.get() - c0) / 1e9}%.3fs")
    }
    spark.stop()
  }
}

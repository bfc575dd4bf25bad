package tools

import scala.collection.mutable.ArrayBuffer

/** Per-stage CPU/wall attribution for one SparkEntry query:
  * `Test/runMain tools.ProfileStages <query> [pass2only]` against
  * SPARK_GRAFT_SF_DIR (default sf0.1). Prints every completed stage of
  * the chosen pass sorted by executor CPU, with task count, records
  * read/written and the first line of the stage's call site — the
  * "where did the 60 CPU-seconds actually go" tool that TimeQuery's
  * one-number answer can't give.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse(sys.error("usage: ProfileStages <query>"))
    val spark = graft.EngineSession.local("32", "profile-stages",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    case class St(id: Int, name: String, tasks: Int, cpuS: Double, wallS: Double,
        recIn: Long, recShufIn: Long, recShufOut: Long)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        if (m != null) stages.synchronized {
          stages += St(i.stageId, i.name.linesIterator.next(), i.numTasks,
            m.executorCpuTime / 1e9,
            (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3,
            m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.recordsRead, m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()

    // pass 1 (warm-up, discarded) then pass 2 (profiled)
    // "cold" mode: profile the FIRST execution (the bench-visible cost,
    // including every slot/memo build this query triggers) instead of
    // the warm pass-2 (the intrinsic recompute cost)
    val cold = args.contains("cold")
    if (!cold) {
      graft.SparkEntry.queries(q)(spark, dir).count()
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      stages.synchronized(stages.clear())
    }
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(q)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)

    val snap = stages.synchronized(stages.toVector)
    println(f"[profile] $q ${if (cold) "cold" else "pass2"} wall=$wall%.2fs rows=$n stages=${snap.size} " +
      f"cpuTotal=${snap.map(_.cpuS).sum}%.2fs")
    snap.sortBy(-_.cpuS).take(40).foreach { s =>
      println(f"[stage] id=${s.id}%4d cpu=${s.cpuS}%7.2fs wall=${s.wallS}%6.2fs " +
        f"tasks=${s.tasks}%3d in=${s.recIn}%9d shufIn=${s.recShufIn}%9d " +
        f"shufOut=${s.recShufOut}%9d  ${s.name.take(90)}")
    }
    spark.stop()
  }
}

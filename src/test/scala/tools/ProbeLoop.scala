package tools

/** Sustained-load reproducer for thread-stack sampling:
  * `Test/runMain tools.ProbeLoop <query> <iterations>` re-runs one
  * SparkEntry query in a loop against SPARK_GRAFT_SF_DIR (default
  * sf0.1) so an external `jstack` can catch what the task threads are
  * actually burning CPU on (the per-task-overhead investigations).
  */
object ProbeLoop {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse(sys.error("usage: ProbeLoop <query> [n]"))
    val n = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.EngineSession.local("32", "probe-loop",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    println(s"[probe] pid=${ProcessHandle.current().pid()} looping $q x$n")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[probe] pass$i wall=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$c")
    }
    spark.stop()
  }
}

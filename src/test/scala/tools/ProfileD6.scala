package tools

/** Profiles the connected-components consumers (d6/t9/t11) at sf0.1 in
  * ONE session, the way Verify/Bench run them — shows the shared
  * signature table AND the shared converged label table doing their job
  * (t9/t11 should pay no second convergence).
  */
object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d6-profile")
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("nocodegen")) spark.conf.set("spark.sql.codegen.wholeStage", "false")
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (args.contains("fewpart")) spark.conf.set("spark.sql.shuffle.partitions", "4")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n " +
        s"ccRounds=${graft.ops.Dedup.lastConvergenceRounds}")
    }
    for (q <- Seq("d6_dedup_clusters", "t9_curate_clustered", "t11_prepare_corpus",
                  "d6_dedup_clusters")) // repeat d6: fully-warm floor
      time(q.take(3)) { graft.SparkEntry.queries(q)(spark, dir).count() }
    spark.stop()
  }
}

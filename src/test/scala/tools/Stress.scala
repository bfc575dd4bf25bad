package tools

/** 10x-scale stress run of the shuffle-heavy relational queries (6M-row
  * lineitem) — empirical backing for the SCALING.md linear-scaling claims.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "stress")
    val dir = "/tmp/stress"
    Seq("a1_full_agg", "j1_broadcast_join", "j2_multi_join", "w1_window_dedup",
        "j3_decorrelated_quota", "w2_analytics", "x6_percentiles", "t5_wordcount")
      .foreach { q =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"[stress] $q%-24s ${(System.nanoTime()-t0)/1e9}%7.2fs rows=$n")
      }
    spark.stop()
  }
}

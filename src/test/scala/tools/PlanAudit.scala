package tools

/** Prints condensed physical plans for the headline queries — the
  * "is this the plan I'd want at 100 TB" audit.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("8", "plan-audit")
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq("a1_full_agg", "p1_projection_filter", "j1_broadcast_join",
      "j2_multi_join", "j3_decorrelated_quota", "w1_window_dedup", "d2_minhash_neardup",
      "v1_topk_cosine", "v3_ivf_topk", "e1_sessionize", "air1_mart_pipeline",
      "x11_bucketed_join", "x12_salted_join", "t7_repetition")
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      // condensed: tree lines only, trimmed
      println(plan.linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}

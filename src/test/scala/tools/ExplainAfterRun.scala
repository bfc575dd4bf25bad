package tools

/** Print the POST-EXECUTION (final AQE) plan of any SparkEntry query:
  * `Test/runMain tools.ExplainAfterRun q1 q2 ...` (defaults to sf0.001;
  * SPARK_GRAFT_SF_DIR overrides). Unlike [[ExplainQuery]], the query is
  * executed first, so AdaptiveSparkPlan prints the decisions AQE
  * actually made at the data's real size — broadcast conversions,
  * coalesced shuffle reads, skew splits.
  */
object ExplainAfterRun {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "explain-after-run",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

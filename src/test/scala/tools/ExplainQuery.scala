package tools

/** Print the executed plan of any SparkEntry query:
  * `Test/runMain tools.ExplainQuery q1 q2 ...` (defaults to sf0.001).
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("8", "explain-query",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

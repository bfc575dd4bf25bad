package tools

/** Time any SparkEntry queries in a fresh JVM:
  * `Test/runMain tools.TimeQuery q1 q2 ...` against SPARK_GRAFT_SF_DIR
  * (default sf0.1). Prints wall seconds per query, two passes each.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "time-query",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { q =>
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"[time-query] $q%-24s pass$pass ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      }
    }
    spark.stop()
  }
}

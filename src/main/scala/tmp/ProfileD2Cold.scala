package tmp

/** Replicates Bench's exact conditions for d2: fresh session, trivial
  * warmup, then time d2 cold (first kernel-heavy query of the run).
  */
object ProfileD2Cold {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("d2 cold") {
      graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8).count()
    }
    time("d2 warm") {
      graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8).count()
    }
    time("d2 warm2") {
      graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8).count()
    }
    spark.stop()
  }
}

package tools

object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d6-profile")
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("nocodegen")) spark.conf.set("spark.sql.codegen.wholeStage", "false")
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (args.contains("fewpart")) spark.conf.set("spark.sql.shuffle.partitions", "4")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    for (i <- 1 to 2) time(s"d6 #$i") {
      val pairs = graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8)
      graft.ops.Dedup.connectedComponents(pairs).count()
    }
    spark.stop()
  }
}

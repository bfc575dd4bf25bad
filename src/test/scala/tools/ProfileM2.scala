package tools

object ProfileM2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "m2-profile")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    for (i <- 1 to 2) time(s"m2 #$i") {
      val media = graft.ops.Multimodal.syntheticPngPayload(docs, "doc_id", "text", 32).toDF()
      graft.ops.Multimodal.imageStats(media, 32).count()
    }
    spark.stop()
  }
}

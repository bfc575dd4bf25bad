package tmp

/** Compares LSH near-dup pairs against exact n-gram Jaccard pairs at a
  * scale factor: is LSH recall exactly 1.0 on this data?
  */
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "d2-vs-d4")
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val lsh = graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8)
        .select("id_a", "id_b")
      val exact = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8)
        .select("id_a", "id_b")
      val missed = exact.exceptAll(lsh).count()
      val extra = lsh.exceptAll(exact).count()
      println(s"[cmp] $dir lsh=${lsh.count()} exact=${exact.count()} missed=$missed extra=$extra")
    }
    spark.stop()
  }
}

package tools

import org.apache.spark.sql.functions._

/** Measure naive vs prefix-filtered exact n-gram Jaccard: wall/CPU and
  * candidate-pair volume, on (a) the benign sf0.1 documents table and
  * (b) a stopword-headed corpus where a handful of shingles appear in
  * most documents — the regime the prefix filter exists for.
  */
object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.EngineSession.local("*", "profile-d4")
    import spark.implicits._
    spark.range(1000).selectExpr("sum(id)").collect()
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
        ()
      }
    })
    def time(tag: String)(f: => Long): Unit = {
      val c0 = cpu.get(); val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
      println(f"[d4] $tag $sec%.2fs cpu=${(cpu.get() - c0) / 1e9}%.2fs rows=$rows")
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (i <- 1 to 2) {
      time(s"sf-naive run$i")(
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.8).count())
      time(s"sf-prefix run$i")(
        graft.ops.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.8).count())
      time(s"sf-auto run$i")(
        graft.ops.Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 0.8).count())
    }

    // stopword-headed corpus: every doc shares an 8-word boilerplate
    // header (think license banners / nav chrome), distinct tails; plus
    // planted near-dup pairs. Naive: the header shingles post in ALL
    // docs -> quadratic. Prefix: header shingles are the most frequent,
    // so they never enter a prefix.
    val nDocs = 20000
    val skew = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(
        lit("terms of service apply to all content on this site "),
        // near-dup pairs: ids 2k/2k+1 share the tail, one word differs
        concat_ws(" ",
          (0 until 12).map(j => concat(lit(s"w$j"), (col("id") / 2).cast("long") * 31 + j)): _*),
        when(col("id") % 2 === 0, lit(" even")).otherwise(lit(" odd"))
      ).as("text"))
      .persist()
    skew.count()
    for (i <- 1 to 2) {
      time(s"skew-naive run$i")(
        graft.ops.Dedup.ngramJaccardPairs(skew, "doc_id", "text", 0.7).count())
      time(s"skew-prefix run$i")(
        graft.ops.Dedup.ngramJaccardPairsPrefix(skew, "doc_id", "text", 0.7).count())
      time(s"skew-auto run$i")(
        graft.ops.Dedup.ngramJaccardPairsAuto(skew, "doc_id", "text", 0.7).count())
    }
    spark.stop()
  }
}

package tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the sparse-retrieval pipeline: times each
  * sub-relation so the serial stage is identified by measurement.
  */
object ProfileV11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.EngineSession.local("*", "profile-v11")
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val words = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("word"))
    time("words.count")(println("  n=" + words.count()))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    time("tf.count")(println("  n=" + tf.count()))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    time("dfreq.count")(println("  n=" + dfreq.count()))
    val n = docs.where(col("text").isNotNull).agg(count(lit(1)).as("n_docs"))
    val weights = tf.join(dfreq, Seq("word")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        (col("tf") * expr(
          "cast(round((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000) as bigint)")).as("w"))
    time("weights.count")(println("  n=" + weights.count()))
    val norms = weights.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    time("norms.count")(println("  n=" + norms.count()))
    val q = weights.join(docs.where(col("doc_id") % 25 === 0).select("doc_id"), Seq("doc_id"))
      .select(col("doc_id").as("query_id"), col("word"), col("w").as("wq"))
    time("q.count")(println("  n=" + q.count()))
    val dots = q.join(weights.withColumnRenamed("doc_id", "neighbor_id")
        .repartition(32, col("word")), Seq("word"))
      .where(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("wq") * col("w")).as("dot"))
    time("dots.count")(println("  n=" + dots.count()))
    time("dots.count again")(println("  n=" + dots.count()))
    spark.stop()
  }
}

package tools

object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("4", "smoke")
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.streaming.EventStreams.normalizeTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    ev.select(min("ts"), max("ts")).show(false)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    println("emb: " + emb.schema.simpleString)
    import graft.functions.ObfuscateName.obfuscate_name
    val d = spark.createDataFrame(Seq(Tuple1("Lane Weber Obama"), Tuple1("Solo"), Tuple1("A  B"))).toDF("n")
    d.select(obfuscate_name(col("n")).as("m")).show(false)
    // simhash + minhash quick run
    graft.ops.TextAnalysis.analyze(docs).show(3)
    val nd = graft.ops.Dedup.minhashNearDup(docs, "doc_id", "text", 0.8)
    println("minhash pairs: " + nd.count())
    val tk = graft.ops.Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3)
    tk.show(10, false)
    val sh = graft.ops.Dedup.simhashNearDup(docs, "doc_id", "text", 3)
    println("simhash pairs: " + sh.count())
    val ss = graft.ops.Sessions.aggregate(ev, "user_id", "ts", 3600)
    println("sessions: " + ss.count())
    spark.stop()
  }
}

package tools

import org.apache.spark.sql.functions._

/** Stage-cost breakdown of the t16 repeated-spans pipeline at sf0.1. */
object ProfileT16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "profile-t16", Map())
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile-t16] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val shared = d.where(col("doc_id") < 30)
      .select(col("doc_id").as("k"), col("text").as("stext"))
    val aug = d.withColumn("k", col("doc_id") % 30)
      .join(shared, Seq("k"))
      .select(col("doc_id"), concat(col("text"), lit(" "), col("stext")).as("text"))
    time("aug corpus")(aug.count())
    val L = 40
    val grams = aug
      .where(col("text").isNotNull && length(col("text")) >= L)
      .select(col("doc_id"), col("text").as("txt"),
        explode(sequence(lit(0), length(col("text")) - L)).as("pos"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        unhex(md5(col("txt").substr(col("pos") + 1, lit(L)))).as("gk"))
    time("gram project (narrow)")(grams.count())
    val ranked = grams.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("gk"))
        .orderBy(col("doc_id").asc, col("pos").asc)))
      .where(col("rn") > 1).select(col("doc_id"), col("pos"))
    time("rank window (gk shuffle)")(ranked.count())
    time("full repeatedSpans")(
      graft.ops.Dedup.repeatedSpans(aug, "doc_id", "text", L).count())
    time("full again (warm)")(
      graft.ops.Dedup.repeatedSpans(aug, "doc_id", "text", L).count())
    spark.stop()
  }
}

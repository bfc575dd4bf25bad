package tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object ProfileV3b {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = graft.ops.Similarity.ivfBuild(emb, "vec_id", "embedding")
    idx.cells.count()
    import graft.functions.VectorKernels.cosine_native
    val probes = emb
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
      .crossJoin(broadcast(idx.centroidArr))
      .select(col("query_id"), col("q_vec"),
        explode(graft.functions.IvfCells.top_cells(col("q_vec"), col("cents"), 4)).as("cell"))
    val scored = idx.cells
      .join(broadcast(probes), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine_native(col("q_vec"), col("c_vec")))
    // warm
    scored.count(); scored.count()
    time("probes only")(probes.count())
    time("join+cosine")(scored.count())
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    val full = scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
    full.count()
    time("with window")(full.count())
    idx.unpersist()
    spark.stop()
  }
}

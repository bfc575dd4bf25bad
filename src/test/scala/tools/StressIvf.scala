package tools

import org.apache.spark.sql.functions._

/** IVF-vs-brute-force crossover: deterministic synthetic corpus of N
  * 64-dim vectors, |Q| queries; times v1 (brute force) vs v3
  * (ivfBuild + ivfProbe) as N grows. Backs SCALING.md.
  */
object StressIvf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $label%-28s $s%8.2fs rows=$n")
      s
    }
    // deterministic pseudo-random vectors: dim-wise xxhash of (id, d)
    def corpus(n: Long) = spark.range(n)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> cast(sin(xxhash64(id, d)) as float))").as("embedding"))

    for (n <- Seq(20000L, 100000L, 300000L)) {
      val c = corpus(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      val q = c.where(col("vec_id") < 2000)
      // warm plans
      graft.ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 5).count()
      val tv1 = time(s"v1 brute n=$n q=2000")(
        graft.ops.Similarity.bruteForceTopK(c, q, "vec_id", "embedding", 5).count())
      val t0 = System.nanoTime()
      val idx = graft.ops.Similarity.ivfBuild(c, "vec_id", "embedding", nCentroids = 64)
      idx.cells.count()
      val tb = (System.nanoTime() - t0) / 1e9
      println(f"[stress] v3 build n=$n%-18s $tb%8.2fs")
      val tp = time(s"v3 probe n=$n q=2000")(
        graft.ops.Similarity.ivfProbe(idx, q, "vec_id", "embedding", 5, nProbe = 4).count())
      println(f"[stress] n=$n v1=$tv1%.2f v3_build=$tb%.2f v3_probe=$tp%.2f v3_total=${tb + tp}%.2f")
      idx.unpersist(); c.unpersist()
    }
    spark.stop()
  }
}

package tools

import org.apache.spark.sql.functions._

/** Gram-key hash cost: unhex(md5(substr)) vs struct(xxhash64 x2) over
  * the same 3M 40-char substrings (the t16 sf0.1 workload shape).
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(5000).select(
      col("id"),
      concat_ws(" ", expr(
        "transform(sequence(0, 99), w -> conv(xxhash64(id, w), 10, 36))")).as("text"))
      .persist(); docs.count()
    val grams = docs
      .select(col("id"), col("text").as("txt"),
        explode(sequence(lit(0), length(col("text")) - 40)).as("pos"))
    def time(label: String)(f: => Long): Unit = {
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"[hash-bench] $label%-24s pass$pass ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      }
    }
    val sub = col("txt").substr(col("pos") + 1, lit(40))
    time("baseline substr-only") {
      grams.select(length(sub).as("x")).agg(sum("x")).head.getLong(0)
    }
    time("unhex(md5(substr))") {
      grams.select(unhex(md5(sub)).as("gk")).selectExpr("sum(length(gk))").head.getLong(0)
    }
    time("xxhash64 pair") {
      grams.select(xxhash64(sub).as("h1"), xxhash64(sub, lit(7777)).as("h2"))
        .selectExpr("sum(hash(h1, h2))").head.getLong(0).toLong
    }
    spark.stop()
  }
}

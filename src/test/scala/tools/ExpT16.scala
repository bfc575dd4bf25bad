package tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B experiment for t16's gram-rank stage: row_number window vs
  * unbounded min(struct) window vs agg+join. Asserts identical outputs,
  * prints per-variant wall + executor CPU at SPARK_GRAFT_SF_DIR.
  */
object ExpT16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "exp-t16",
      Map("spark.sql.legacy.parquet.nanosAsLong" -> "true"))
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) cpu.addAndGet(m.executorCpuTime)
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()

    val L = 40
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val shared = d.where(col("doc_id") < 30)
      .select(col("doc_id").as("k"), col("text").as("stext"))
    val aug = d.withColumn("k", col("doc_id") % 30)
      .join(shared, Seq("k"))
      .select(col("doc_id"), concat(col("text"), lit(" "), col("stext")).as("text"))
    val grams = aug
      .where(col("text").isNotNull && length(col("text")) >= L)
      .repartition(32, col("doc_id"))
      .select(col("doc_id").as("id"),
        posexplode(graft.functions.CharGrams.char_gram_digests(col("text"), L))
          .as(Seq("pos", "gk")))
      .select(col("id"), col("pos").cast("long").as("pos"), col("gk"))

    def time(label: String)(f: => Long): Unit = {
      for (pass <- 1 to 2) {
        org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
        val c0 = cpu.get(); val t0 = System.nanoTime(); val n = f
        org.apache.spark.graft.sparkShims.drainListenerBus(spark.sparkContext)
        println(f"[exp-t16] $label%-22s pass$pass wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
          f"cpu=${(cpu.get() - c0) / 1e9}%7.2fs rows=$n")
      }
    }

    // A: current shape — row_number over (gk) ordered by (id, pos)
    val vA = grams.withColumn("rn", row_number().over(
        Window.partitionBy(col("gk")).orderBy(col("id").asc, col("pos").asc)))
      .where(col("rn") > 1).select("id", "pos")
    // B: unbounded min(struct) over (gk), filter non-min
    val vB = grams.withColumn("first", min(struct(col("id"), col("pos"))).over(
        Window.partitionBy(col("gk"))))
      .where(struct(col("id"), col("pos")) =!= col("first")).select("id", "pos")
    // C: aggregate + self-join on gk
    val firsts = grams.groupBy("gk").agg(min(struct(col("id"), col("pos"))).as("first"),
      count(lit(1)).as("n")).where(col("n") > 1)
    val vC = grams.join(firsts, Seq("gk"))
      .where(struct(col("id"), col("pos")) =!= col("first")).select("id", "pos")

    time("A row_number")(vA.count())
    time("B min-window")(vB.count())
    time("C agg+join")(vC.count())
    val ca = vA.groupBy("id").agg(sum(col("pos")).as("s"), count(lit(1)).as("c"))
      .agg(sum(col("s")), sum(col("c")), count(lit(1))).collect()(0).toSeq
    val cb = vB.groupBy("id").agg(sum(col("pos")).as("s"), count(lit(1)).as("c"))
      .agg(sum(col("s")), sum(col("c")), count(lit(1))).collect()(0).toSeq
    val cc = vC.groupBy("id").agg(sum(col("pos")).as("s"), count(lit(1)).as("c"))
      .agg(sum(col("s")), sum(col("c")), count(lit(1))).collect()(0).toSeq
    println(s"[exp-t16] checksums A=$ca B=$cb C=$cc equal=${ca == cb && cb == cc}")
    spark.stop()
  }
}

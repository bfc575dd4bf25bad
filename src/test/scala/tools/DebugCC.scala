package tools

import org.apache.spark.sql.functions._

object DebugCC {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "debug-cc")
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (args.contains("nobc")) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    import org.apache.spark.sql.graft.shims.releaseCheckpoint

    val n = 50000L
    val pairs = spark.range(0, n).select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val oneHop = edges
      .join(edges.select(col("src").as("dst"), col("dst").as("hop2")), Seq("dst"))
      .select(col("src"), col("hop2").as("dst"))
      .unionByName(edges)
    var state = oneHop.groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(true)
    def labels = state.select("id", "label")
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < 13) {
      val t0 = System.nanoTime()
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist(MEMORY_AND_DISK)
      val nextPlan = stepped.as("s")
        .join(stepped.select(col("id").as("label"), col("label").as("label2")).as("p"),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
        .join(labels.select(col("id"), col("label").as("prev")), Seq("id"))
        .select(col("id"), col("label"), (col("label") < col("prev")).as("improved"))
      val t05 = System.nanoTime()
      val nStepped = stepped.count() // materialize the cache first
      val t1 = System.nanoTime()
      val doubled = stepped.as("s")
        .join(stepped.select(col("id").as("label"), col("label").as("label2")).as("p"),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
      val nDoubled = doubled.count()
      val t15 = System.nanoTime()
      val next = nextPlan.localCheckpoint(true)
      val t2 = System.nanoTime()
      println(f"[debug-cc]   stepped=${(t1-t05)/1e9}%6.2fs ($nStepped) doubled=${(t15-t1)/1e9}%6.2fs ($nDoubled)")
      changed = next.where(col("improved")).count()
      iter += 1
      println(f"[debug-cc] round=$iter changed=$changed build=${(t2-t1)/1e9}%6.2fs")
      stepped.unpersist(blocking = false)
      releaseCheckpoint(state)
      state = next
    }
    spark.stop()
  }
}

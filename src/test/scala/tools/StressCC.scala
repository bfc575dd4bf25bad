package tools

import org.apache.spark.sql.functions._

/** Scale/shape stress for connectedComponents:
  *   - a 200k-node PATH (diameter 200k) — the adversarial shape for
  *     label propagation: linear min-label needs ~200k rounds, pointer
  *     doubling must fold it in ~log2(200k) ≈ 18;
  *   - 100k dense 10-node clusters (1M nodes, 4.5M edges) — the
  *     realistic near-dup shape, converging almost entirely in the
  *     2-hop seed.
  */
object StressCC {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("32", "stress-cc")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[stress-cc] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n " +
        s"rounds=${graft.ops.Dedup.lastConvergenceRounds}")
    }
    time("path diameter=200k") {
      val chain = spark.range(0, 200000).select($"id".as("id_a"), ($"id" + 1).as("id_b"))
      val cc = graft.ops.Dedup.connectedComponents(chain, maxIter = 30)
      val distinct = cc.agg(countDistinct($"cluster_id")).head().getLong(0)
      require(distinct == 1, s"path must be ONE component, got $distinct")
      cc.count()
    }
    time("100k clusters of 10") {
      // cluster c = nodes 10c..10c+9, all pairs within (45 edges each);
      // pair (i,j) encoded as i*10+j in one int literal array
      val offs = (0 until 10).combinations(2).map(p => p(0) * 10 + p(1)).toArray
      val pairs = spark.range(0, 100000).select($"id".as("c"))
        .select($"c", explode(lit(offs)).as("e"))
        .select(($"c" * 10 + ($"e" / 10).cast("long")).as("id_a"),
          ($"c" * 10 + $"e" % 10).as("id_b"))
      val cc = graft.ops.Dedup.connectedComponents(pairs, maxIter = 10)
      val distinct = cc.agg(countDistinct($"cluster_id")).head().getLong(0)
      require(distinct == 100000L, s"expected 100k components, got $distinct")
      cc.count()
    }
    spark.stop()
  }
}

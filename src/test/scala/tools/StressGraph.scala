package tools

import org.apache.spark.sql.functions._

/** Scale evidence for the iterative graph tier beyond the sf0.1 trade
  * graph: a deterministic random graph (endpoints from md5, both
  * orientations) at 500k nodes / 2M directed edges, driving BFS and
  * label propagation through their real round loops. What to look for:
  * per-round cost is nodes/edges-linear (the adjacency builds once into
  * the cache slot; rounds join nodes-sized relations), and wall stays
  * in seconds per round — depth/rounds, not graph size, is the latency
  * axis.
  *
  * Measured on this box (500k nodes, 4M directed edges, local[32]):
  *   bfsHops maxHops=5        10.1 s  (5 seeds → 160,820 labeled — the
  *                                    8^depth BFS ball, as expected on
  *                                    a mean-degree-8 random graph)
  *   labelPropagation r=3     12.5 s  (41,355 communities)
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toInt).getOrElse(500000)
    val nEdges = 4 * nNodes
    val spark = graft.EngineSession.local("*", "stress-graph")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val edges = spark.range(nEdges.toLong).select(
      expr(s"cast(conv(substr(md5(concat('s', id)), 1, 12), 16, 10) as bigint) % $nNodes").as("s"),
      expr(s"cast(conv(substr(md5(concat('d', id)), 1, 12), 16, 10) as bigint) % $nNodes").as("d"))
      .where(col("s") =!= col("d"))
    val undirected = edges.unionAll(edges.select(col("d").as("s"), col("s").as("d")))
    undirected.persist()
    println("edges(directed both ways): " + undirected.count())

    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[stress-graph] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
    }
    val seeds = Seq(0L, 1L, 2L, 3L, 4L).toDF("seed")
    time("bfsHops maxHops=5") {
      val r = graft.ops.Graph.bfsHops(undirected, "s", "d", seeds, "seed", 5)
      println("  labeled=" + r.count())
    }
    time("labelPropagation r=3") {
      val r = graft.ops.Graph.labelPropagation(undirected, "s", "d", 3)
      println("  communities=" + r.select("community").distinct().count())
    }
    spark.stop()
  }
}

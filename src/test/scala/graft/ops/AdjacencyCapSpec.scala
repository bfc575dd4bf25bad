package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The degree-capped CSR adjacency (`graft.adjacency.degreeCap`): a hub's
  * neighbor list must split into bounded segments BEFORE any array is
  * collected (guide §2.5 — a 1e8-degree web hub is otherwise a multi-GB
  * row inside one aggregation buffer), and every loop operator consuming
  * the segmented layout must return bit-identical results, because each
  * segment row joins the round state independently and the union of the
  * exploded slices is exactly the whole neighbor list.
  */
class AdjacencyCapSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def withCap[A](cap: Int)(body: => A): A = {
    System.setProperty("graft.adjacency.degreeCap", cap.toString)
    try body
    finally System.clearProperty("graft.adjacency.degreeCap")
  }

  test("synthetic 1e6-degree hub: segments stay bounded, nothing lost") {
    val hubEdges = spark.range(1000000L)
      .select(lit(0L).as("src"), (col("id") + 1L).as("dst"))
    val adj = withCap(1000) {
      Graph.groupedAdjacency(hubEdges, "src", "dst", "dsts",
        useSet = false, withCount = true)
    }
    val rows = adj.select(col("src"), size(col("dsts")).as("n"), col("outdeg"))
      .collect()
    // ceil(1e6/1000) = 1000 hash segments; xxhash64 spreads ~uniformly,
    // so no segment should exceed a small multiple of the cap — this is
    // the bounded-max-task-bytes property the cap exists for
    assert(rows.length == 1000, s"expected 1000 segments, got ${rows.length}")
    val maxSeg = rows.map(_.getInt(1)).max
    assert(maxSeg <= 3000, s"segment of $maxSeg neighbors exceeds 3x the cap")
    assert(rows.map(_.getInt(1).toLong).sum == 1000000L, "neighbors lost/duplicated")
    assert(rows.forall(_.getLong(2) == 1000000L), "outdeg must be the TRUE degree")
  }

  test("low-degree vertices keep one segment under a cap") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val adj = withCap(1000) {
      Graph.groupedAdjacency(edges, "src", "dst", "dsts",
        useSet = false, withCount = true)
    }
    assert(adj.count() == 2) // one row per source, no inflation
  }

  test("pageRank is bit-identical capped vs uncapped") {
    // ring + star mixture, outdeg up to 5 — cap 2 forces real segmentation
    val edges = (for (i <- 0L until 40L; j <- 1L to (i % 5 + 1))
      yield (i, (i + j) % 40L)).toDF("src", "dst")
    val plain = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val capped = withCap(2) {
      Graph.pageRank(edges, "src", "dst", iterations = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(capped == plain)
  }

  test("bfsHops and hits are bit-identical capped vs uncapped") {
    val edges = (for (i <- 0L until 30L; j <- 1L to (i % 4 + 1))
      yield (i, (i * 7 + j) % 30L)).filter(p => p._1 != p._2).toDF("src", "dst")
    val seeds = Seq(0L).toDF("s")
    val plainBfs = Graph.bfsHops(edges, "src", "dst", seeds, "s", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plainHits = Graph.hits(edges, "src", "dst", iterations = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val (cappedBfs, cappedHits) = withCap(2) {
      (Graph.bfsHops(edges, "src", "dst", seeds, "s", 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap,
        Graph.hits(edges, "src", "dst", iterations = 2)
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap)
    }
    assert(cappedBfs == plainBfs)
    assert(cappedHits == plainHits)
  }
}

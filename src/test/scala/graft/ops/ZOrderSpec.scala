package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("morton kernel: interleaving is exact and order-embedding on quadrants") {
    import graft.functions.InterleaveBits.{morton, spread}
    assert(spread(0L) == 0L && spread(0xFFFFFFFFL) == 0x5555555555555555L)
    assert(morton(0, 0) == 0L)
    assert(morton(1, 0) == 2L && morton(0, 1) == 1L) // a takes odd (higher) bits
    assert(morton(0xFFFFFFFFL, 0xFFFFFFFFL) == -1L)  // all 64 bits set
    // prefix property: same high bits of (a,b) => same high bits of z
    assert((morton(0x80000000L, 0x00000000L) >>> 62) == 2L)
    assert((morton(0x80000000L, 0x80000000L) >>> 62) == 3L)
  }

  private def scratch(tag: String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_zorder_$tag").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(d)
    d.getAbsolutePath
  }

  test("roundtrip: the layout rewrite is semantically invisible") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val path = scratch("rt")
    ZOrder.zorderWrite(li, "l_orderkey", "l_partkey", path, numFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.count() == li.count())
    val key = Seq("l_orderkey", "l_linenumber")
    assert(back.select(key.map(col): _*).exceptAll(li.select(key.map(col): _*)).isEmpty)
    assert(li.select(key.map(col): _*).exceptAll(back.select(key.map(col): _*)).isEmpty)
  }

  test("z-order bounds BOTH dimensions; a linear sort leaves the other unbounded") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val zPath = scratch("z")
    val linPath = scratch("lin")
    ZOrder.zorderWrite(li, "l_orderkey", "l_partkey", zPath, numFiles = 16)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)

    // 10% window at 20–30% of the domain: inside one major Z quadrant.
    // (A window STRADDLING the 50% boundary is the curve's worst case —
    // it touches both b-halves and prunes ~2× less; inherent to Z-order,
    // the reason Hilbert curves exist, not a bug here.)
    val maxPk = li.agg(max("l_partkey")).head().getLong(0)
    val (lo, hi) = (maxPk * 20 / 100, maxPk * 30 / 100)
    val zFiles = ZOrder.filesOverlapping(spark, zPath, "l_partkey", lo, hi)
    val linFiles = ZOrder.filesOverlapping(spark, linPath, "l_partkey", lo, hi)
    // linear-by-orderkey: every file spans ~the whole partkey domain
    assert(linFiles == 16, s"linear layout should not prune partkey: $linFiles")
    // bound 10, not 8: file cut points come from repartitionByRange's
    // SAMPLED boundaries, so the touched-file count wobbles ±1 around
    // the ~8 ideal run to run — the claim under test is the CONTRAST
    // with the un-prunable linear layout, not an exact file count
    assert(zFiles <= 10, s"z-order should prune most files: $zFiles vs linear $linFiles")
    // and the z-layout still prunes its FIRST dimension too
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0)
    val zFilesOk = ZOrder.filesOverlapping(
      spark, zPath, "l_orderkey", maxOk * 20 / 100, maxOk * 30 / 100)
    assert(zFilesOk <= 10, s"z-order should prune orderkey windows too: $zFilesOk")
  }

  test("hilbert kernel: corners, inverse roundtrip, and the unit-step property") {
    import graft.functions.HilbertIndex.{hilbert, inverse, Order}
    assert(hilbert(0, 0) == 0L)
    // the full square: 4^31 - 1 is the last index, and it's non-negative
    val last = (1L << (2 * Order)) - 1
    assert(hilbert(1L << (Order - 1), 0) >= 0 && hilbert((1L << Order) - 1, 0) <= last)
    // deterministic pseudo-random walk over the index space: inverse is a
    // right inverse of the forward map, and consecutive indices are always
    // Manhattan-distance-1 neighbors (Morton fails this at every quadrant
    // boundary — e.g. z=1->2 jumps from (0,1) to (1,0), distance 2)
    var seed = 0x9E3779B97F4A7C15L
    (1 to 2000).foreach { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val d = (seed >>> 2) % last // in [0, last)
      val (x1, y1) = inverse(d)
      val (x2, y2) = inverse(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1}: ($x1,$y1) -> ($x2,$y2)")
      assert(hilbert(x1, y1) == d, s"roundtrip at $d")
    }
  }

  test("hilbert layout: invisible rewrite; prunes the straddle window Morton cannot") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val hPath = scratch("h")
    val zPath = scratch("z2")
    ZOrder.hilbertWrite(li, "l_orderkey", "l_partkey", hPath, numFiles = 16)
    ZOrder.zorderWrite(li, "l_orderkey", "l_partkey", zPath, numFiles = 16)
    // layout is semantically invisible
    val back = spark.read.parquet(hPath)
    val key = Seq("l_orderkey", "l_linenumber")
    assert(back.count() == li.count())
    assert(back.select(key.map(col): _*).exceptAll(li.select(key.map(col): _*)).isEmpty)
    // the Z-curve's documented worst case: a window straddling the 50%
    // boundary of the SECOND (even-bit) dimension touches both b-halves
    // of every a-quadrant; Hilbert's unit steps keep files compact there
    val maxPk = li.agg(max("l_partkey")).head().getLong(0)
    val (lo, hi) = (maxPk * 45 / 100, maxPk * 55 / 100)
    val hFiles = ZOrder.filesOverlapping(spark, hPath, "l_partkey", lo, hi)
    val zFiles = ZOrder.filesOverlapping(spark, zPath, "l_partkey", lo, hi)
    assert(hFiles <= zFiles,
      s"hilbert should never be worse on the straddle window: h=$hFiles z=$zFiles")
    assert(hFiles <= 8, s"hilbert should still prune the straddle window: $hFiles")
    // and both of its dimensions stay bounded (the basic z-order property)
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0)
    val hOk = ZOrder.filesOverlapping(
      spark, hPath, "l_orderkey", maxOk * 20 / 100, maxOk * 30 / 100)
    assert(hOk <= 8, s"hilbert should prune orderkey windows too: $hOk")
  }

  test("degenerate constant column does not divide by zero") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "b")
    val path = scratch("const")
    ZOrder.zorderWrite(df, "a", "b", path, numFiles = 2)
    assert(spark.read.parquet(path).count() == 3)
  }
}

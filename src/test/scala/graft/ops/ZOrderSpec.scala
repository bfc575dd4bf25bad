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
    assert(zFiles <= 8, s"z-order should prune at least half the files: $zFiles")
    // and the z-layout still prunes its FIRST dimension too
    val maxOk = li.agg(max("l_orderkey")).head().getLong(0)
    val zFilesOk = ZOrder.filesOverlapping(
      spark, zPath, "l_orderkey", maxOk * 20 / 100, maxOk * 30 / 100)
    assert(zFilesOk <= 8, s"z-order should prune orderkey windows too: $zFilesOk")
  }

  test("degenerate constant column does not divide by zero") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "b")
    val path = scratch("const")
    ZOrder.zorderWrite(df, "a", "b", path, numFiles = 2)
    assert(spark.read.parquet(path).count() == 3)
  }
}

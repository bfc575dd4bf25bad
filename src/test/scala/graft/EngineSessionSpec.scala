package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-partition autosizer's contract: every SF this repo
  * hash-verifies on this box must keep the thread-count default (so the
  * verified plans stay bit-identical), and the 4th-decade input that
  * measured 458 GB of spill at 32 partitions must derive the measured
  * knee (~128; SCALING.md). Sizes below are the real on-disk footprints.
  */
class EngineSessionSpec extends AnyFunSuite {
  private val MiB = 1L << 20

  test("verified test SFs keep the thread-count default") {
    // sf0.001 ~0.3 MB, sf0.01 ~2 MB, sf0.1 ~17 MB, 10x ~170 MB, 100x ~1.7 GB
    for (bytes <- Seq(0L, 300 * 1024L, 2 * MiB, 17 * MiB, 170 * MiB, 1700 * MiB))
      assert(EngineSession.derivePartitions(32, bytes) === 32,
        s"input $bytes B must not change the verified small-SF plans")
  }

  test("1000x-scale input derives the measured knee, not the thread count") {
    val p = EngineSession.derivePartitions(32, 17L << 30) // /tmp/sf1000x ~17 GB
    assert(p >= 128 && p <= 160, s"expected ~128 (the measured knee), got $p")
  }

  test("dirBytes resolves file:// URIs identically to bare local paths") {
    // The autosizer must see real bytes for every scheme Spark can read —
    // a local-FS-only walk would size a remote input as 0 and silently
    // reinstate the 458 GB-spill thread-count default (VERDICT r9 item 1).
    val dir = java.nio.file.Files.createTempDirectory("graft-dirbytes").toFile
    val sub = new java.io.File(dir, "nested")
    try {
      java.nio.file.Files.write(
        new java.io.File(dir, "part-0000.bin").toPath, Array.fill[Byte](4096)(7))
      sub.mkdirs()
      java.nio.file.Files.write(
        new java.io.File(sub, "part-0001.bin").toPath, Array.fill[Byte](1024)(7))
      val bare = EngineSession.dirBytes(dir.getAbsolutePath)
      assert(bare === 5120L, "recursive local sizing must count nested part files")
      assert(EngineSession.dirBytes("file://" + dir.getAbsolutePath) === bare,
        "file:// URI must size identically to the bare path")
    } finally {
      Option(sub.listFiles()).foreach(_.foreach(_.delete())); sub.delete()
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("unresolvable inputs size as 0 (thread-count fallback), never crash") {
    assert(EngineSession.dirBytes("/no/such/graft/path") === 0L)
    assert(EngineSession.dirBytes("nosuchscheme://bucket/prefix") === 0L)
  }

  test("derivation is monotone in input size and floored at threads") {
    val sizes = Seq(0L, 1 * MiB, 4096 * MiB, 17L << 30, 170L << 30)
    val parts = sizes.map(EngineSession.derivePartitions(32, _))
    assert(parts === parts.sorted)
    assert(parts.forall(_ >= 32))
    // a 100 TB-shaped input keeps deriving (no silent cap)
    assert(EngineSession.derivePartitions(32, 170L << 30) > 1000)
  }
}

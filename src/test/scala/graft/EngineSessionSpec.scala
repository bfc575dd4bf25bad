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

  test("derivation is monotone in input size and floored at threads") {
    val sizes = Seq(0L, 1 * MiB, 4096 * MiB, 17L << 30, 170L << 30)
    val parts = sizes.map(EngineSession.derivePartitions(32, _))
    assert(parts === parts.sorted)
    assert(parts.forall(_ >= 32))
    // a 100 TB-shaped input keeps deriving (no silent cap)
    assert(EngineSession.derivePartitions(32, 170L << 30) > 1000)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  graft.GraftExtensions.register(spark) // SQL surface (bloom_agg/bloom_contains)

  private def build(hashes: Seq[Long], bits: Int, k: Int, parts: Int): Array[Byte] =
    hashes.toDF("h").repartition(parts)
      .agg(expr(s"bloom_agg(h, $bits, $k)").as("bf"))
      .collect().head.getAs[Array[Byte]](0)

  test("no false negatives: every inserted hash probes true, under any partitioning") {
    val hashes = (0 until 5000).map(i => Bloom.fmix64(i.toLong * 0x9e3779b97f4a7c15L))
    for (parts <- Seq(1, 3, 8)) {
      val bf = build(hashes, 1 << 16, 7, parts)
      hashes.foreach(h =>
        assert(Bloom.containsKernel(bf, h), s"false negative for $h at parts=$parts"))
    }
  }

  test("build is byte-identical under any partitioning and input duplication") {
    // OR is commutative, associative, idempotent — the bitset cannot
    // depend on merge order or duplicates (unlike order-sensitive
    // sketches), so the artifact is deterministic by construction
    val hashes = (0 until 2000).map(i => Bloom.fmix64(i.toLong))
    val one = build(hashes, 1 << 14, 5, 1)
    val many = build(hashes, 1 << 14, 5, 7)
    val dup = build(hashes ++ hashes.take(500), 1 << 14, 5, 3)
    assert(java.util.Arrays.equals(one, many))
    assert(java.util.Arrays.equals(one, dup))
  }

  test("false-positive rate is near the sizing formula, never a failure mode") {
    // n=10000 into m=2^17 bits with k=7: (1-e^(-kn/m))^k ~ 0.8%
    val inserted = (0 until 10000).map(i => Bloom.fmix64(i.toLong))
    val bf = build(inserted, 1 << 17, 7, 4)
    val absent = (0 until 20000).map(i => Bloom.fmix64(1000000L + i))
    val fp = absent.count(Bloom.containsKernel(bf, _))
    assert(fp.toDouble / absent.size < 0.03,
      s"FP rate ${fp.toDouble / absent.size} far above the ~0.8% sizing")
    assert(fp > 0, "a 2^17-bit filter holding 10k keys should show SOME false positives")
  }

  test("codegen and interpreted probes agree") {
    val inserted = (0L until 300L).map(Bloom.fmix64)
    val bf = build(inserted, 1 << 12, 7, 2)
    val probes = (0L until 600L).map(Bloom.fmix64) // first half present
    val df = probes.toDF("h")
      .crossJoin(Seq(Tuple1(bf)).toDF("bf"))
      .select(col("h"), Bloom.bloom_contains(col("bf"), col("h")).as("c"))
    val viaPlan = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    probes.foreach { h =>
      assert(viaPlan(h) == Bloom.containsKernel(bf, h), s"codegen mismatch for $h")
    }
    assert(inserted.forall(viaPlan(_)))
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val buf = new BloomBuffer(1 << 10, 3)
    (0L until 100L).foreach(i => buf.put(Bloom.fmix64(i)))
    val rt = Bloom.deserialize(Bloom.serialize(buf))
    assert(rt.numBits == buf.numBits && rt.numHashes == buf.numHashes)
    assert(java.util.Arrays.equals(rt.words, buf.words))
  }

  test("null hashes are skipped, not inserted") {
    val bf = Seq(Some(1L), None, Some(2L)).toDF("h")
      .agg(Bloom.bloom_agg(col("h"), 1 << 10, 3).as("bf"))
      .collect().head.getAs[Array[Byte]](0)
    assert(Bloom.containsKernel(bf, 1L) && Bloom.containsKernel(bf, 2L))
  }

  test("type errors are clean AnalysisExceptions") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("s").agg(expr("bloom_agg(s, 1024, 3)")).collect()
    }
    assert(e.getMessage.contains("BIGINT"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("h").agg(expr("bloom_agg(h, h, 3)")).collect()
    }
    assert(e2.getMessage.contains("literal"))
  }
}

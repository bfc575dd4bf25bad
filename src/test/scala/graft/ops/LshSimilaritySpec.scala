package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sign-LSH near-dup vs the exact all-pairs variant: on clustered
  * vectors with high-cosine planted pairs the bucketed result must equal
  * the exact result (recall ≈ 1 at 64×8 bits for cos ≥ 0.9; exact
  * verification removes all false positives).
  */
class LshSimilaritySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def clustered = {
    val rnd = new scala.util.Random(11)
    val dim = 32
    // 10 cluster centers; 5 members each = center + tiny noise (cos ≈ 0.99+)
    val rows = (0 until 10).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian())
      (0 until 5).map { m =>
        val v = center.map(x => (x + rnd.nextGaussian() * 0.02).toFloat)
        (c * 10L + m, v)
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("LSH near-dup equals exact all-pairs on high-cosine clusters") {
    val df = clustered
    val exact = Similarity.embeddingNearDup(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshEmbeddingNearDup(df, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty) // planted pairs exist
    assert(lsh == exact)
  }

  test("no cross-cluster false positives survive verification") {
    val out = Similarity.lshEmbeddingNearDup(clustered, "vec_id", "embedding", 0.95)
      .collect()
    assert(out.forall(r => r.getLong(0) / 10 == r.getLong(1) / 10))
    assert(out.forall(_.getDouble(2) >= 0.95))
  }

  test("autoBits: 16 without a hint, monotone in n, bands stay under the guard") {
    // no hint (v4's call shape) must keep the legacy 16-bit default —
    // the driver-gated v4 plan is unchanged by the new knob
    assert(Similarity.autoBits(0) == 16)
    assert(Similarity.autoBits(10000, 0.8) == 16)
    val sweep = Seq(1e4, 1e5, 1e6, 1e7, 1e8).map(n => Similarity.autoBits(n.toLong, 0.8))
    assert(sweep == sweep.sorted, s"autoBits not monotone: $sweep")
    assert(sweep.forall(b => b >= 16 && b <= 32))
    // every derived width must be usable: the matching band count stays
    // inside autoBands' 4096-band guard (no require blow-up at plan time)
    for (n <- Seq(1e4, 1e6, 1e9); theta <- Seq(0.8, 0.9, 0.95)) {
      val bits = Similarity.autoBits(n.toLong, theta)
      assert(Similarity.autoBands(theta, bits) <= 4096)
    }
  }

  test("corpusSizeHint widens the keys without losing the planted pairs") {
    val exact = Similarity.embeddingNearDup(clustered, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // force the widest practical keys (hint far above the real corpus):
    // autoBands re-derives the band count for the wider keys, so recall
    // at the threshold is preserved by construction
    val hinted = Similarity.lshEmbeddingNearDup(
      clustered, "vec_id", "embedding", 0.95, corpusSizeHint = 100000000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hinted == exact)
  }
}

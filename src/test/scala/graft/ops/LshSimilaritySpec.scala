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
}

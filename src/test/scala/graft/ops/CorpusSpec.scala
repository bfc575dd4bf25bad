package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup of 0
    (3L, "completely different text about spark engines and scala compilers running distributed jobs"),
    (4L, "short"),                                       // fails token gate
    (5L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18") // fails alpha gate
  ).toDF("doc_id", "text")

  test("curation: quality gate, exact-dup survivor, greedy near-dup removal") {
    val out = Corpus.curate(docs, "doc_id", "text", minTokens = 10, minAlphaRatio = 0.5,
      jaccardThreshold = 0.55) // one word in 14 differs -> 9/15 trigram jaccard = 0.6
      .collect().map(_.getLong(0)).sorted.toSeq
    // 4,5 gated out; 1 exact-dup of 0 (higher id dropped); 2 near-dup of 0 dropped; 0,3 survive
    assert(out == Seq(0L, 3L))
  }

  test("LSH variant produces the same curated set here") {
    val out = Corpus.curate(docs, "doc_id", "text", jaccardThreshold = 0.55, useLsh = true)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 3L))
  }
}

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

  test("clustered curation keeps exactly one doc per near-dup cluster") {
    val out = Corpus.curateClustered(docs, "doc_id", "text", minTokens = 10,
      minAlphaRatio = 0.5, jaccardThreshold = 0.55)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 3L))
  }

  test("clustered curation links components THROUGH gated-out docs") {
    // X (doc 1) fails the token gate but is a near-dup bridge between A
    // (doc 0) and C (doc 2): jaccard(A,X)=jaccard(C,X)=0.7, while
    // jaccard(A,C)=7/13≈0.538 < 0.55. Cluster membership is a corpus
    // property: {A,X,C} is ONE cluster, so of the surviving docs {A,C}
    // only the smallest id A is kept. (Restricting pairs to survivors
    // first — the old policy — would have kept both.)
    val bridged = Seq(
      (0L, "alpha beta gamma common body text shared phrase continues across nine words"),
      (1L, "common body text shared phrase continues across nine words"), // 9 tokens: gated out
      (2L, "common body text shared phrase continues across nine words delta epsilon zeta"),
      (3L, "entirely unrelated content concerning distributed query planners and shuffles today")
    ).toDF("doc_id", "text")
    val out = Corpus.curateClustered(bridged, "doc_id", "text", minTokens = 10,
      minAlphaRatio = 0.5, jaccardThreshold = 0.55)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 3L))
  }

  test("decontamination flags train docs sharing an n-gram with eval") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta suffix here"), // contaminated
      (2L, "totally unrelated content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L))
    assert(out(1L) == 4L) // 4 shared trigrams of the 6-word eval phrase
  }

  test("split assignment is content-stable and respects percentages") {
    val big = spark.range(10000).toDF("doc_id")
    val out = Corpus.assignSplit(big, "doc_id", 90, 5)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: each split within 2% absolute of target
    assert(math.abs(counts("train") / 10000.0 - 0.90) < 0.02, counts)
    assert(math.abs(counts("val") / 10000.0 - 0.05) < 0.02, counts)
    assert(math.abs(counts("test") / 10000.0 - 0.05) < 0.02, counts)
    // stable across invocations and independent of row order
    val again = Corpus.assignSplit(big.orderBy(org.apache.spark.sql.functions.rand(1)),
      "doc_id", 90, 5)
    assert(out.exceptAll(again).count() == 0)
  }

  test("stratified mixing keeps per-stratum fractions, content-stable") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(10000).select(
      $"id".as("doc_id"),
      when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "de").otherwise("xx").as("lang"))
    val out = Corpus.sampleStratified(docs, "doc_id", "lang",
      Map("en" -> 10000, "de" -> 5000), defaultBps = 0)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 3334L) // 10000 bps keeps every en doc
    assert(counts.get("xx").isEmpty) // unmapped stratum -> defaultBps 0 drops all
    assert(math.abs(counts("de") / 3333.0 - 0.5) < 0.03, counts) // md5 uniformity
    // content-stable: same kept set regardless of row order
    val again = Corpus.sampleStratified(docs.orderBy(rand(7)), "doc_id", "lang",
      Map("en" -> 10000, "de" -> 5000), defaultBps = 0)
    assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
  }
}

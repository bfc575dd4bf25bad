package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test for the composed LLM corpus pipeline
  * (llm1_corpus_pipeline): a crafted corpus where EVERY stage drops
  * exactly one known document — quality gate, exact dedup, near-dup
  * connected components — so a regression in any tier moves a
  * specific funnel count.
  */
class LlmPipelineSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // 30 words, mean word length ≈4, all-alpha, 5 stopword hits → passes
  // every Gopher rule
  private val good =
    "the quick brown fox jumps over a lazy dog and runs to the nearby " +
      "forest of tall green trees while birds sing songs of joy under " +
      "the warm morning sun"
  // one word changed → 27 of 29 union shingles shared, J ≈ 0.93 ≥ 0.8
  private val nearDup = good.replace("morning sun", "morning sky")

  test("llm1: each pipeline stage drops its intended document; funnel counts and token budget are exact") {
    val dir = java.nio.file.Files.createTempDirectory("llm1_spec_").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(dir)
    Seq(
      (1L, good, "en"),     // survives everything
      (2L, good, "en"),     // exact copy → dropped by md5 dedup
      (3L, nearDup, "en"),  // near-dup → dropped by Jaccard CC
      (4L, "zz", "en"))     // fails the quality gate
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = SparkEntry.queries("llm1_corpus_pipeline")(spark, dir.getAbsolutePath)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map("en" -> ((4L, 3L, 2L, 1L, 30L))))
  }

  test("llm1: a language with zero survivors still reports its raw count (funnel never loses rows)") {
    val dir = java.nio.file.Files.createTempDirectory("llm1_spec0_").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(dir)
    Seq((1L, good, "en"), (2L, "junk only", "de"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val out = SparkEntry.queries("llm1_corpus_pipeline")(spark, dir.getAbsolutePath)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      "en" -> ((1L, 1L, 1L, 1L, 30L)),
      "de" -> ((1L, 0L, 0L, 0L, 0L))))
  }
}

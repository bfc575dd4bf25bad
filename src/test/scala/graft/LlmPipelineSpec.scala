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

  test("llm2: the streaming head — gate, cross-batch dedup state, history anti-join — " +
       "one file per micro-batch equals one batch, golden rows pinned") {
    import org.apache.spark.sql.streaming.OutputMode
    val goodB = good.replace("quick brown fox", "slow grey wolf")
    val dir = java.nio.file.Files.createTempDirectory("llm2_spec_").toString
    // one file per write → maxFilesPerTrigger=1 replays each as its own
    // micro-batch; the doc-203 duplicate arrives TWO BATCHES after 201,
    // so dropping it proves dropDuplicates state carries across batches
    for (batch <- Seq(
        Seq((201L, good, "en"), (202L, "too short", "en")),
        Seq((204L, good, "de")),          // same text, DIFFERENT lang → kept
        Seq((203L, good, "en"), (205L, goodB, "en"))))
      batch.toDF("doc_id", "text", "lang")
        .coalesce(1).write.mode("append").parquet(dir)
    val history = Seq((1L, goodB, "en")).toDF("doc_id", "text", "lang")
    def run(multiBatch: Boolean): Set[(String, String, Long)] = {
      val r = spark.readStream
        .schema(spark.read.parquet(dir).schema)
      val stream = (if (multiBatch) r.option("maxFilesPerTrigger", "1") else r)
        .parquet(dir)
      val out = graft.streaming.CorpusStreams.ingestPipeline(
        stream, history, "doc_id", "text", "lang", minWords = 30)
      graft.streaming.EventStreams.runToMemorySink(spark, out,
        s"llm2_mb_$multiBatch", OutputMode.Append())
        .collect().map(r0 => (r0.getString(1), r0.getString(2), r0.getLong(3)))
        .toSet
    }
    val multi = run(multiBatch = true)
    assert(multi == run(multiBatch = false))
    // survivors: good-en once (203 deduped cross-batch), good-de (other
    // lang), NOT goodB (in history), NOT 202 (quality)
    val goodMd5 = org.apache.commons.codec.digest.DigestUtils.md5Hex(good)
    assert(multi == Set(("en", goodMd5, 30L), ("de", goodMd5, 30L)))
  }
}

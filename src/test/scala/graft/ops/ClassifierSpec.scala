package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // constant-weight model: every bucket weighs `w` micro-units, so a
  // doc's score is w * n_features — feature counting is then directly
  // observable without reverse-engineering md5 buckets
  private def flatWeights(w: Long) =
    spark.range(64).select(col("id").as("bucket"), lit(w).as("weight_fp"))

  test("feature space is unigrams + adjacent bigrams, occurrences counted") {
    val docs = Seq((1L, "x y"), (2L, "a a a")).toDF("id", "text")
    val out = Classifier.hashedLinearScore(docs, "id", "text", flatWeights(1L), 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "x y"  -> x, y, "x y"            = 3 features
    // "a a a"-> a×3, "a a"×2           = 5 features (occurrences, not distinct)
    assert(out(1L) == ((3L, 3L)))
    assert(out(2L) == ((5L, 5L)))
  }

  test("one-token doc yields exactly one feature — no fabricated null bigram") {
    // sequence(0, -1) DESCENDS in Spark; the size guard must keep a
    // single-token doc at 1 unigram instead of adding a null bigram
    val docs = Seq((1L, "hello")).toDF("id", "text")
    val out = Classifier.hashedLinearScore(docs, "id", "text", flatWeights(1L), 64)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L && out.head.getLong(2) == 1L)
  }

  test("label is the sign of the integer score; empty docs are excluded") {
    val docs = Seq((1L, "good text here"), (2L, "   "), (3L, "")).toDF("id", "text")
    val keep = Classifier.hashedLinearScore(docs, "id", "text", flatWeights(5L), 64)
    val drop = Classifier.hashedLinearScore(docs, "id", "text", flatWeights(-5L), 64)
    assert(keep.collect().map(r => (r.getLong(0), r.getString(3))).toSet == Set(1L -> "keep"))
    assert(drop.collect().map(r => (r.getLong(0), r.getString(3))).toSet == Set(1L -> "drop"))
  }

  test("case folding: features come from the lowercased token stream") {
    val docs = Seq((1L, "Word WORD word")).toDF("id", "text")
    val out = Classifier.hashedLinearScore(docs, "id", "text", flatWeights(1L), 64)
      .collect().head
    assert(out.getLong(1) == 5L) // word×3 + "word word"×2 — all fold together
  }

  test("synthetic weights: full bucket space, bounded range, deterministic") {
    val w = Classifier.syntheticWeights(spark, 4096).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == 4096)
    assert(w.values.forall(v => v >= -1000L && v <= 1000L))
    assert(w(0L) == -1000L) // 0 * k % 2001 - 1000
    assert(w(1L) == 2654435761L % 2001L - 1000L)
    val again = Classifier.syntheticWeights(spark, 4096).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == again)
  }

  test("score equals the sum of the matched bucket weights (hand-joined)") {
    // cross-check against an independent formulation: explode the same
    // features via SQL and join the same weights table
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha")).toDF("id", "text")
    val w = Classifier.syntheticWeights(spark, 4096)
    val got = Classifier.hashedLinearScore(docs, "id", "text", w, 4096)
      .select("id", "score_fp").as[(Long, Long)].collect().toMap
    docs.createOrReplaceTempView("cls_docs")
    w.createOrReplaceTempView("cls_w")
    val manual = spark.sql(
      """SELECT id, sum(weight_fp) AS s FROM (
           SELECT id, CAST(conv(substring(md5(f), 1, 8), 16, 10) AS BIGINT) % 4096 AS bucket
           FROM (SELECT id, explode(concat(w,
                   IF(size(w) >= 2, transform(sequence(0, size(w) - 2),
                      i -> concat(w[i], ' ', w[i+1])), array()))) AS f
                 FROM (SELECT id, split(lower(text), '\\s+') AS w FROM cls_docs))
         ) JOIN cls_w USING (bucket) GROUP BY id""")
      .as[(Long, Long)].collect().toMap
    assert(got == manual)
  }

  test("dsirSelect: target-like docs outrank raw-only docs; identical text ties on weight") {
    val docs = Seq(
      (1L, "good words here", true),   // the target slice
      (2L, "good words here", false),  // same text, NOT target — same weight
      (3L, "bad junk junk", false),
      (4L, "bad junk junk", false)).toDF("doc_id", "text", "tgt")
    val out = Classifier.dsirSelect(docs, "doc_id", "text",
        isTarget = col("tgt"), buckets = 512, topK = 4)
      .select("doc_id", "weight_fp").as[(Long, Long)].collect()
    val byId = out.toMap
    // docs 1/2 share every feature, so their weights are identical and
    // strictly above the junk docs' (whose features never occur in the
    // target histogram → negative log-ratios)
    assert(byId(1L) == byId(2L))
    assert(byId(3L) == byId(4L))
    assert(byId(1L) > byId(3L))
    // selection order: weight DESC then id ASC
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("dsirSelect: topK truncates at the (weight DESC, id ASC) boundary") {
    // equal-length docs: DSIR weights sum over feature OCCURRENCES, so
    // ranking across different doc lengths mixes length into the score —
    // the discriminating case is same-length, different-content
    val docs = Seq(
      (10L, "alpha alpha", true), (11L, "alpha alpha", false),
      (12L, "omega omega", false)).toDF("doc_id", "text", "tgt")
    val kept = Classifier.dsirSelect(docs, "doc_id", "text",
        isTarget = col("tgt"), buckets = 512, topK = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L)) // the tied target-like pair wins; id breaks nothing here
  }

  test("dsirSelect: weight is the exact integer sum of per-bucket micro-nat log-ratios") {
    // ONE doc, one token, replicated so counts are non-trivial: verify
    // the fixed-point weight against an independently computed value
    val docs = Seq(
      (1L, "zz", true), (2L, "zz", true), (3L, "zz", false)).toDF("doc_id", "text", "tgt")
    val out = Classifier.dsirSelect(docs, "doc_id", "text",
        isTarget = col("tgt"), buckets = 512, topK = 3)
      .select("doc_id", "n_features", "weight_fp").as[(Long, Long, Long)].collect()
    // single bucket b: cr=3, ct=2, nr=3, nt=2, B=512
    // w = round(ln((3·515)/(4·514)) · 1e6) = round(ln(1545/2056)·1e6)
    val expect = Math.round(Math.log((2.0 + 1.0) * (3.0 + 512.0) /
      ((3.0 + 1.0) * (2.0 + 512.0))) * 1e6)
    assert(out.toSet == Set((1L, 1L, expect), (2L, 1L, expect), (3L, 1L, expect)))
  }

  private def curve(rows: (Long, java.lang.Boolean)*) = {
    val df = rows.toSeq.toDF("score_fp", "is_pos")
    Classifier.prCurve(df, "score_fp", "is_pos")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)).map(_.asInstanceOf[Long]), r.getLong(7)))).toMap
  }

  test("prCurve: hand-computed confusion counts and floored-bp ratios at every threshold") {
    // scores 5(+), 5(−), 3(+), 1(−):
    //   τ=5: tp=1 fp=1 fn=1 tn=1 → P 5000, R 5000, F1 5000
    //   τ=3: tp=2 fp=1 fn=0 tn=1 → P 6666 (floored), R 10000, F1 8000
    //   τ=1: tp=2 fp=2 fn=0 tn=0 → P 5000, R 10000, F1 6666
    val out = curve(5L -> true, 5L -> false, 3L -> true, 1L -> false)
    assert(out == Map(
      5L -> ((1L, 1L, 1L, 1L, 5000L, Some(5000L), 5000L)),
      3L -> ((2L, 1L, 0L, 1L, 6666L, Some(10000L), 8000L)),
      1L -> ((2L, 2L, 0L, 0L, 5000L, Some(10000L), 6666L))))
  }

  test("prCurve: no positives in the labeled slice → recall NULL, precision/F1 zero") {
    val out = curve(7L -> false, 2L -> false)
    assert(out == Map(
      7L -> ((0L, 1L, 0L, 1L, 0L, None, 0L)),
      2L -> ((0L, 2L, 0L, 0L, 0L, None, 0L))))
  }

  test("prCurve: NULL labels count on neither side — totals and cumulatives agree") {
    val out = curve(5L -> true, 5L -> null, 1L -> false)
    assert(out == Map(
      5L -> ((1L, 0L, 0L, 1L, 10000L, Some(10000L), 10000L)),
      1L -> ((1L, 1L, 0L, 0L, 5000L, Some(10000L), 6666L))))
  }

  test("prCurve: more distinct thresholds than the documented bound RAISES — " +
      "the unpartitioned sweep must never silently serialize an unbounded grid") {
    val df = Seq(5L -> true, 3L -> false, 1L -> true).toDF("score_fp", "is_pos")
    val e = intercept[Exception] {
      Classifier.prCurve(df, "score_fp", "is_pos", maxThresholds = 2L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("distinct thresholds exceeds")), e.toString)
    // at or under the bound the curve is untouched
    assert(Classifier.prCurve(df, "score_fp", "is_pos", maxThresholds = 3L)
      .count() == 3L)
  }
}

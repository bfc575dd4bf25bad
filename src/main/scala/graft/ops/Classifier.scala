package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed-feature linear classifier inference — the fastText-shaped
  * quality-classifier pass LLM data pipelines run corpus-wide (GPT-3's
  * WebText-similarity filter, LLaMA's Wikipedia-reference classifier;
  * Joulin et al. 2016). The model is a WEIGHTS TABLE, not code: features
  * hash into a fixed bucket space (the hashing trick), each bucket
  * carries a learned weight, and a document's score is the sum of its
  * feature-occurrence weights.
  *
  * Cross-engine determinism: features bucket via the engine's standard
  * portable hash (first 8 md5 hex digits mod `buckets` — the t10/t13
  * recipe), and weights are fixed-point micro-units in a LONG, so the
  * per-doc score is an integer sum that no accumulation order can move.
  * The keep/drop decision is `score_fp >= 0` — exact.
  *
  * Scale shape (100 TB contract): one tokenize pass fanned out AFTER a
  * repartition on the id (the engine's standard fan-out guard), feature
  * rows join the buckets-sized weights table (AQE broadcasts it — the
  * model is KB-to-MB scale by construction), then one hash aggregate
  * back to doc grain with map-side partials. Nothing touches the driver;
  * no UDFs — the whole path is codegen'd built-ins.
  */
object Classifier {

  /** Deterministic synthetic model weights: bucket b's micro-unit weight
    * is `(b * 2654435761) % 2001 - 1000` ∈ [-1000, 1000] (Knuth's
    * multiplicative constant; any engine reproduces the table exactly).
    * Stands in for trained weights in tests/oracles — a real model loads
    * the same (bucket, weight_fp) shape from its training job.
    */
  def syntheticWeights(spark: SparkSession, buckets: Int): DataFrame =
    spark.range(buckets).select(col("id").as("bucket"),
      (col("id") * 2654435761L % 2001L - 1000L).as("weight_fp"))

  /** Portable feature bucket: first 8 md5 hex digits of the feature
    * string, mod the bucket space (identical to `Corpus`'s split/mix
    * bucketing, so every engine agrees on the bit pattern).
    */
  private def bucketOf(feature: Column, buckets: Int): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % buckets

  /** Score every document against a (bucket, weight_fp) linear model
    * over hashed unigram + adjacent-bigram features of the lowercased
    * whitespace token stream. Feature OCCURRENCES count (bag-of-words,
    * fastText's `-wordNgrams 2` feature space).
    *
    * @return (idCol, n_features, score_fp, label) for docs with ≥ 1
    *         token; `label` is 'keep' iff the integer score is ≥ 0
    */
  def hashedLinearScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "bucket space must be positive")
    val base = docs
      .repartition(col(idCol))
      .select(col(idCol), TextAnalysis.tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 1)
    // unigrams ++ adjacent bigrams ("w1 w2"), one array expression —
    // a single explode fans out both families. The size guard matters:
    // sequence(0, -1) DESCENDS in Spark, so an unguarded one-token doc
    // would fabricate a null bigram
    val feats = base.select(col(idCol),
        explode(concat(col("w"), expr(
          """IF(size(w) >= 2,
                transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1])),
                array())"""))).as("f"))
      .select(col(idCol), bucketOf(col("f"), buckets).as("bucket"))
    feats.join(weights.select(col("bucket"), col("weight_fp")), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum("weight_fp").as("score_fp"))
      .withColumn("label", when(col("score_fp") >= 0L, "keep").otherwise("drop"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely a TARGET-domain hashed-n-gram
    * model finds it than the raw-corpus model, and keep the top-k. The
    * standard recipe for skewing a web crawl toward a quality domain
    * (Wikipedia-like, code-like) without training a classifier — the
    * "model" is two bucket-count histograms.
    *
    * Per bucket b, with add-one smoothing over the `buckets`-sized
    * space: `w(b) = ln(p_target(b) / p_raw(b))`, and a document's
    * importance is the sum of `w` over its feature OCCURRENCES (its
    * log-likelihood ratio under the two bag-of-features models).
    *
    * Cross-engine determinism: per-bucket weights become fixed-point
    * micro-nats (`round(ln(·)·10⁶)` as LONG — the t19/t23 recipe) via
    * the identical IEEE tree in both engines: each count factor is an
    * exact-integer double (exact below 2^53 — at the default 2¹² bucket
    * space that holds to ~10¹⁵ corpus tokens), one correctly-rounded
    * multiply per side, one divide, one ln. Per-doc sums are then
    * integer, immune to accumulation order; selection order is
    * (weight_fp DESC, id ASC) — total.
    *
    * Scale shape: one tokenize/hash pass (the t22 feature path), one
    * buckets-sized count aggregate with map-side partials, corpus-total
    * scalars via a one-row cross join, a buckets-sized weights join
    * (AQE broadcasts it), one integer aggregate to doc grain, and a
    * TakeOrderedAndProject top-k — never a global sort of the corpus.
    * The target corpus never moves: only its bucket HISTOGRAM leaves
    * the aggregation, which is why DSIR scales where classifier
    * training doesn't.
    *
    * @param isTarget predicate Column over `docs` rows defining the
    *                 target distribution (e.g. a trusted source flag)
    * @param topK     documents to keep (weight DESC, id ASC)
    * @return (idCol, n_features, weight_fp) for the k selected docs
    */
  def dsirSelect(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 4096,
      topK: Int = 100): DataFrame = {
    require(buckets > 0, "bucket space must be positive")
    require(topK > 0, "topK must be positive")
    val base = docs
      .repartition(col(idCol))
      .select(col(idCol), isTarget.cast("boolean").as("is_tgt"),
        TextAnalysis.tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 1)
    val feats = base.select(col(idCol), col("is_tgt"),
        explode(concat(col("w"), expr(
          """IF(size(w) >= 2,
                transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1])),
                array())"""))).as("f"))
      .select(col(idCol), col("is_tgt"), bucketOf(col("f"), buckets).as("bucket"))
    // raw = ALL docs (the distribution documents are drawn from), so
    // every doc feature is present in the raw histogram by construction;
    // ct coalesces to 0 for buckets the target never hits
    val counts = feats.groupBy("bucket")
      .agg(count(lit(1)).as("cr"), sum(col("is_tgt").cast("long")).as("ct"))
    val totals = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val weights = counts.crossJoin(totals).select(col("bucket"),
      expr(
        s"""CAST(ROUND(LN((CAST(ct + 1 AS DOUBLE) * CAST(nr + $buckets AS DOUBLE)) /
           |(CAST(cr + 1 AS DOUBLE) * CAST(nt + $buckets AS DOUBLE))) * 1000000) AS BIGINT)"""
          .stripMargin).as("w_fp"))
    feats.join(weights, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum("w_fp").as("weight_fp"))
      .orderBy(col("weight_fp").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Precision/recall threshold sweep — the calibration step between
    * training a quality classifier and running it corpus-wide: before
    * committing a keep/drop cutoff over 100 TB, sweep every observed
    * score threshold against a labeled slice and read off the
    * confusion counts and P/R/F1 the cutoff would buy.
    *
    * At threshold τ a document is predicted positive iff score ≥ τ, so
    * the whole curve falls out of ONE cumulative pass: aggregate to
    * score grain (n_pos/n_neg per distinct score), then running sums
    * ordered score-DESC give tp/fp at every τ simultaneously; fn/tn
    * derive from the one-row totals. Ratios are floored basis points —
    * pure integer division, engine-portable (precision's denominator
    * tp+fp ≥ 1 at every emitted threshold by construction; F1 uses the
    * identity 2tp+fp+fn = tp+fp+total_pos).
    *
    * Scale shape: one map-side-partial aggregate collapses the input
    * to score grain BEFORE any window — the cumulative sweep runs over
    * the distinct-score table (the e34 "window over the triangle,
    * never the events" discipline), and the totals join in as a
    * one-row scalar cross. The unpartitioned window's bound is
    * ENFORCED, not assumed: the sweep `raise_error`s when the
    * distinct-threshold count exceeds `maxThresholds` (default 2¹⁶ —
    * a curve nobody reads point-by-point past that). A high-resolution
    * scorer over an unbounded labeled slice would otherwise funnel a
    * near-doc-count distinct-score table through one task; the guard
    * turns that silent serial plan into a loud instruction to quantize
    * scores to a bounded grid first (the standard PR-curve practice —
    * see the t33 wiring, which buckets fixed-point scores before the
    * sweep). NULL-label rows are dropped up front — an unlabeled row
    * belongs to no side of the confusion matrix, and keeping its score
    * would emit a threshold row with tp+fp = 0 (a divide-by-zero in
    * any replaying engine).
    *
    * @param scoreCol integral score column (fixed-point)
    * @param labelCol boolean ground-truth column
    * @param maxThresholds hard ceiling on distinct thresholds — the
    *        documented bound that keeps the cumulative sweep a
    *        grid-sized window; exceeding it raises, never serializes
    * @return one row per distinct score: (threshold_fp, tp, fp, fn,
    *         tn, precision_bp, recall_bp, f1_bp); recall_bp NULL when
    *         the labeled slice has no positives
    */
  def prCurve(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      maxThresholds: Long = 65536L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = scored
      .where(col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("threshold_fp"))
      .agg(count(when(col(labelCol), 1)).as("n_pos"),
        count(when(!col(labelCol), 1)).as("n_neg"))
    val totals = perScore.agg(
      sum(col("n_pos")).cast("long").as("total_pos"),
      sum(col("n_neg")).cast("long").as("total_neg"),
      // the window-bound guard rides the totals aggregate the sweep
      // already pays for — no extra job, no extra scan
      expr(s"if(count(1) <= ${maxThresholds}L, count(1), raise_error(concat(" +
          s"'prCurve: ', count(1), ' distinct thresholds exceeds the documented " +
          s"bound $maxThresholds - quantize scores to a bounded grid before the sweep')))")
        .as("n_thresholds"))
    val desc = Window.orderBy(col("threshold_fp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .select(col("threshold_fp"),
        sum(col("n_pos")).over(desc).as("tp"),
        sum(col("n_neg")).over(desc).as("fp"))
      .crossJoin(totals)
      // always-true reference that column pruning cannot remove — it is
      // what keeps the raise_error guard in the executed plan
      .where(col("n_thresholds") > 0)
      .select(col("threshold_fp"), col("tp"), col("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        (col("total_neg") - col("fp")).as("tn"),
        expr("(10000 * tp) div (tp + fp)").as("precision_bp"),
        expr("""CASE WHEN total_pos > 0 THEN (10000 * tp) div total_pos
                ELSE CAST(NULL AS BIGINT) END""").as("recall_bp"),
        expr("(20000 * tp) div (tp + fp + total_pos)").as("f1_bp"))
  }
}

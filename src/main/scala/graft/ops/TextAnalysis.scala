package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * Every function here is composed from codegen'd built-ins (no UDFs) so
  * the whole module rides inside whole-stage codegen and scales linearly —
  * a single narrow pass over the corpus, no shuffle. All semantics are
  * deliberately expressible in ANSI-ish SQL so the DuckDB oracle can
  * verify them bit-for-bit.
  */
object TextAnalysis {

  /** jsDivergence's (slice, word) histogram feeds four consumers (word
    * totals, slice totals, the global total, the term join) — without
    * the slot Spark re-tokenizes the corpus once per consumer (the
    * e39/v22 multi-consumer lesson).
    */
  private val jsdHistSlot = new CacheSlot

  /** Whitespace tokens: non-space runs (`\S+`), so empty input yields an
    * empty array and trailing newlines/tabs never produce empty tokens —
    * identical semantics in the native shingle kernel and in DuckDB's
    * regexp_extract_all (the split-on-`\s+`-after-trim formulation
    * differs for non-space edge whitespace: Spark trim() strips only
    * spaces and split keeps boundary empties).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs and individual non-space
    * punctuation each count as one token — a cheap, deterministic proxy
    * for a byte-pair tokenizer's token count.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Exact token-equality count of `word` in a token array (codegen'd:
    * size/array_remove, no lambda). The earlier space-padded
    * length-difference trick undercounted ADJACENT markers ("the the"
    * counted once — the regexp consumed the shared delimiter space).
    */
  def tokenHits(toks: Column, word: String): Column =
    size(toks) - size(array_remove(toks, word))

  /** Marker score for one language: total marker-token hits. */
  private def langScore(toks: Column, markers: Seq[String]): Column =
    markers.map(m => tokenHits(toks, m)).reduce(_ + _)

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "des", "et", "une"),
    "de" -> Seq("der", "die", "und", "das", "ein")
  )

  /** Marker-token language ID: argmax of per-language stopword-token
    * counts with a fixed preference order on ties; 'und' (undetermined)
    * when no marker hits at all; NULL text stays NULL (it is not
    * positively "undetermined"). Deterministic and SQL-expressible.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = markers.map { case (lang, ms) => lang -> langScore(toks, ms) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    when(text.isNull, lit(null).cast("string")).otherwise(
      scores.foldLeft(when(best === 0, "und")) { case (acc, (lang, s)) =>
        acc.when(s === best, lang)
      }.otherwise("und"))
  }

  /** Staged [[langId]]: the single-Column form re-embeds the tokenize
    * and every score in each tie-break branch (the `when` chain
    * references `best`, which references all four scores, which each
    * reference the regexp tokenization) — measured ~1.4 ms/doc at
    * sf0.1 because the regexp runs ~20× per row. Staging tokens →
    * scores → verdict as SEPARATE projections computes each exactly
    * once (~50× less CPU on the confusion rollup); Catalyst's
    * CollapseProject leaves the stages alone precisely because inlining
    * would duplicate non-cheap expressions. Same values, same nulls,
    * same tie order — t2's oracle pins it.
    */
  def withLangPred(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame = {
    val scoreCols = markers.map { case (lang, _) => s"__s_$lang" }
    val withScores = df
      .withColumn("__toks", tokens(lower(col(textCol))))
      .withColumns(markers.map { case (lang, ms) =>
        s"__s_$lang" -> langScore(col("__toks"), ms)
      }.toMap)
    val best = scoreCols.map(col).reduce(greatest(_, _))
    withScores
      .withColumn(outCol,
        when(col(textCol).isNull, lit(null).cast("string")).otherwise(
          markers.foldLeft(when(best === 0, "und")) { case (acc, (lang, _)) =>
            acc.when(col(s"__s_$lang") === best, lang)
          }.otherwise("und")))
      .drop("__toks" +: scoreCols: _*)
  }

  /** Per-document character entropy — the encoded-blob / degenerate-
    * text detector token features miss: base64 dumps, hex blobs and
    * minified code read HIGH (near-uniform characters), repeated-
    * character spam reads LOW, while prose sits in a narrow band.
    * Micro-nat terms via the shared
    * [[graft.ops.Stats.entropyTermSql]] tree over the per-doc
    * character histogram (codepoint grain — Spark `split(text, "")`
    * and DuckDB `string_split(text, '')` agree), summed as exact longs.
    * Thresholding is caller policy; this emits the measurement.
    *
    * Scale shape: the char fan-out is repartitioned by id first (the
    * standard fan-out discipline) and collapses to (doc, distinct
    * char) — alphabet-sized per doc — before the doc-partitioned
    * window and rollup.
    *
    * @return (idCol, n_chars, n_distinct_chars, entropy_micro)
    */
  def charEntropy(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val par = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val hist = docs.where(col(textCol).isNotNull)
      .repartition(par, col(idCol))
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .where(length(col("ch")) > 0)
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
    hist
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(idCol)))
      .withColumn("term", expr(graft.ops.Stats.entropyTermSql("c", "n")))
      .groupBy(col(idCol))
      .agg(max(col("n")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("term")).as("entropy_micro"))
  }

  /** Code-switching / language-consistency gate: chunk each document
    * into fixed token windows, language-ID every chunk ([[withLangPred]]
    * — the staged form; the single-Column form re-runs the regexp ~20×
    * per row), and report how many informative chunks DISAGREE with the
    * document-level verdict. A doc-level langid happily labels a
    * half-English-half-German page "en" and poisons a monolingual
    * training mix — the per-chunk vote is the standard (Dolma-style)
    * paragraph-level defense. Chunks with no marker hits ('und') are
    * reported but EXCLUDED from the disagreement ratio: a fragment with
    * zero stopwords is uninformative, not contradictory.
    *
    * Scale shape: one corpus scan; the chunk fan-out is doc-grain
    * (bounded by tokens/chunkTokens per doc) and re-aggregates on the
    * id — no corpus-wide shuffle beyond the final rollup. All-integer
    * counts, floored-bp ratio, NULL when every chunk is uninformative.
    *
    * @return (idCol, doc_pred, n_chunks, n_und, n_disagree, mixed_bp)
    *         for documents with ≥ 1 token
    */
  def codeSwitching(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 20): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    val base = withLangPred(
      docs.where(col(textCol).isNotNull).select(col(idCol), col(textCol)),
      textCol, "doc_pred")
      .withColumn("w", tokens(lower(col(textCol))))
      .where(size(col("w")) >= 1)
    val chunks = base.select(col(idCol), col("doc_pred"),
      explode(expr(
        s"""transform(sequence(0, CAST((size(w) + ${chunkTokens - 1})
              div $chunkTokens AS INT) - 1),
            i -> array_join(slice(w, i * $chunkTokens + 1, $chunkTokens), ' '))"""))
        .as("chunk"))
    withLangPred(chunks, "chunk", "chunk_pred")
      .groupBy(col(idCol), col("doc_pred"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_pred") === "und", 1L).otherwise(0L)).as("n_und"),
        sum(when(col("chunk_pred") =!= "und" &&
          col("chunk_pred") =!= col("doc_pred"), 1L).otherwise(0L))
          .as("n_disagree"))
      .withColumn("mixed_bp",
        when(col("n_chunks") > col("n_und"),
          expr("(10000 * n_disagree) div (n_chunks - n_und)")))
  }

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / length(text))

  /** Ratio of alphabetic characters to total characters (0 for empty). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  /** Ratio of tokens that are common-English stopwords — a fluency proxy
    * used by quality classifiers (C4/Gopher-style heuristics).
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stops = Seq("the", "a", "and", "of", "to", "in", "is", "that")
    val hits = stops.map(m => tokenHits(toks, m)).reduce(_ + _)
    when(tokenCount(text) === 0, 0.0).otherwise(hits.cast("double") / tokenCount(text))
  }

  /** Composite quality score in [0,1]: weighted mix of alphabetic density,
    * inverse punctuation density, and length saturation (Gopher-style
    * heuristic rules collapsed to one deterministic number).
    */
  def qualityScore(text: Column): Column =
    round(
      alphaRatio(text) * 0.5 +
        (lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))) * 0.2 +
        least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.2 +
        least(stopwordRatio(text) * 4.0, lit(1.0)) * 0.1,
      6)

  /** Order-sensitive document fingerprint: FNV-1a/64 over the
    * whitespace-normalized token stream (tokens joined by single
    * spaces), so two documents share a fingerprint iff their token
    * SEQUENCES are identical — unlike a set-based signature this is
    * order-sensitive, and unlike raw-text hashing it ignores whitespace
    * layout. FNV-1a is self-contained byte arithmetic any warehouse
    * recomputes bit-for-bit (the oracle does, via UBIGINT xor +
    * HUGEINT modular multiply — same recipe as simhash), which makes
    * the fingerprint a PORTABLE contract, not an engine artifact. Runs
    * as a native codegen kernel ([[graft.functions.Fingerprint]]); see
    * TextAnalysisSpec for the independent-reimplementation parity test.
    */
  def fingerprint(text: Column): Column =
    graft.functions.Fingerprint.fingerprint(text)

  /** Canonical text cleanup — the normalization pass that runs BEFORE
    * any dedup/fingerprint/tokenize step, because those operators treat
    * bytes as identity: (1) Unicode NFC ([[graft.functions.NfcNormalize]]
    * — canonically-equivalent spellings collapse to one byte sequence),
    * (2) strip C0/DEL control characters except tab and newline —
    * mojibake and terminal-control debris, CR included so CRLF text
    * canonicalizes to LF; `\n` survives because paragraph structure is
    * load-bearing for paragraph dedup and boilerplate removal, and tab
    * survives only long enough for stage 3 to fold it into a space —
    * (3) collapse space/tab runs to one space and trim. All three stages
    * are codegen'd per-row passes (native expression + two
    * regexp_replace) in the Java∩RE2 regex subset, so a warehouse
    * recomputes them exactly — no shuffle, no UDF.
    */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.functions.NfcNormalize.nfc_normalize(text),
      "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** PII redaction: emails, then phone-like digit runs, masked with
    * fixed placeholders. Patterns stay inside the regex subset shared by
    * Java's engine and RE2, so warehouse-side SQL (the oracle, or a
    * downstream DuckDB/BigQuery consumer) reproduces the result exactly.
    * One codegen'd regexp pass per pattern — linear, no shuffle.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "\\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>")
  }

  /** Word-repetition metrics (Gopher-style repetition filters, Rae et
    * al. 2021 §A1): per document, the duplicate-word fraction
    * (1 − distinct/total) and the top single word's frequency share.
    * Relational formulation — explode + two hash aggregations with
    * map-side partial combine — so it scales with corpus word mass, not
    * document count × vocabulary.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("word"))
    words
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct_words"),
        max(col("n")).as("top_freq"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        round(lit(1.0) - col("n_distinct_words").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        round(col("top_freq").cast("double") / col("n_words"), 6).as("top_word_frac"))
  }

  /** Per-document top-N terms by TF-IDF (smoothed idf:
    * `ln((N+1)/(df+1)) + 1`, sklearn's convention) — the classic
    * keyword/topical-signature extractor for corpus curation and
    * near-topic grouping.
    *
    * Distributed shape: one explode + (doc, word) hash-agg for tf (cost
    * tracks corpus word mass, map-side combined); df derives from the tf
    * table with a word-keyed agg; the document count N joins back as a
    * single broadcast row (no collect). The per-doc top-N is a
    * `row_number` filter, which Catalyst rewrites to partial+final
    * WindowGroupLimit — each map task keeps only N candidates per doc
    * before the shuffle.
    *
    * Cross-engine determinism: the weight is ROUNDED to 6 decimals
    * BEFORE ranking, and ties break on the word itself, so the (score,
    * word) rank order is identical in any engine whose `ln` is within
    * ~1e-10 of correctly rounded (all mainstream libms).
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String, topN: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.where(col(textCol).isNotNull).agg(count(lit(1)).as("n_docs"))
    val weighted = tf.join(dfreq, Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("word").asc)
    weighted
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(col("doc_id"), col("word"), col("tf"), col("df"), col("tfidf"), col("rank"))
  }

  /** Bigram language-model scoring (the CCNet/perplexity-filter shape):
    * train an MLE bigram model on the corpus itself, score every doc by
    * its mean per-bigram log-probability, and bucket into head / middle
    * / tail — the standard quality split fed to data-mixing. Conditional
    * probability is `c(w1,w2) / c(w1·)` with the denominator counting
    * BIGRAMS starting at `w1` (so probabilities sum to 1 per context;
    * trained-on-self means every scored bigram exists — no backoff
    * branch to keep deterministic).
    *
    * Cross-engine determinism is the whole design: each per-bigram term
    * is ROUNDED to fixed-point micro-nats (`round(ln(c2/c1)·1e6)` as a
    * LONG) before summing, so the per-doc sum is exact integer
    * arithmetic — accumulation order cannot move it, and the bucket
    * decision (`lp_fp` vs `threshold·n`) is an exact long
    * cross-multiplication, never a float ratio. A 1-ulp `ln` difference
    * between engines flips a term only when it lands within ~1e-9 of a
    * rounding boundary — verified exhaustively by the oracle at both
    * test scale factors.
    *
    * Scale shape: one tokenize pass + the bigram fan-out (repartitioned
    * by id first, like every fan-out op, so a few large files cannot
    * serialize it); counts are two hash aggregates over the bigram set
    * (vocabulary-sized, ≪ corpus); the model join is a plain shuffle
    * join AQE converts to broadcast when the vocabulary fits. Nothing
    * touches the driver.
    *
    * @return (idCol, n_bigrams, logprob_fp, bucket) for docs with ≥ 1
    *         bigram; `logprob_fp` is the summed fixed-point micro-nats
    */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      headAvgMicroNats: Long = -3370000L,
      tailAvgMicroNats: Long = -3400000L): DataFrame = {
    require(headAvgMicroNats > tailAvgMicroNats,
      "head threshold must exceed tail threshold (both are negative log-probs)")
    val base = docs
      .repartition(col(idCol))
      .select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 2)
    val bg = base.select(col(idCol),
        explode(expr(
          "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i+1]))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = c2.join(c1, Seq("w1"))
    val termFp = round(log(col("c2").cast("double") / col("c1")) * 1e6, 0).cast("long")
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(termFp).as("logprob_fp"))
      .withColumn("bucket",
        when(col("logprob_fp") >= lit(headAvgMicroNats) * col("n_bigrams"), "head")
          .when(col("logprob_fp") < lit(tailAvgMicroNats) * col("n_bigrams"), "tail")
          .otherwise("middle"))
  }

  /** Held-out bigram-LM scoring with add-one smoothing — the true CCNet
    * shape ([[lmScore]]'s trained-on-self form has no unseen-event
    * branch; a model scoring NEW text must): train counts come from one
    * corpus, scored docs from another, and every probability is
    * `(c2 + 1) / (c1 + V)` with `V = |train vocabulary| + 1`. Unseen
    * events need no token mapping at all: an unseen bigram of a seen
    * context coalesces to `1/(c1+V)` and an unseen context to `1/V` —
    * exactly the shared `<unk>` slot of the add-one convention, falling
    * out of two left joins.
    *
    * Determinism: the t19 recipe — each term quantizes to micro-nat
    * LONGs before the order-free sum; `avg_fp` is floored integer
    * division. Scale: two tokenize passes, vocabulary-sized model
    * relations, the scoring join is bigram-keyed with map-side partial
    * sums; V is a one-row broadcast.
    *
    * @return (id, n_bigrams, logprob_fp, avg_fp) for every scored doc
    *         with ≥ 1 bigram
    */
  def lmScoreHeldOut(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    def bigrams(df: DataFrame) = df
      .repartition(col(idCol))
      .select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 2)
      .select(col(idCol),
        explode(expr(
          "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i+1]))")).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bgT = bigrams(train)
    val c2 = bgT.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bgT.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = train.select(explode(tokens(lower(col(textCol)))).as("w"))
      .agg((countDistinct(col("w")) + 1).as("v"))
    val termFp = round(
      log((coalesce(col("c2"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("c1"), lit(0L)) + col("v"))) * 1e6, 0).cast("long")
    bigrams(score)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(termFp).as("logprob_fp"))
      // negate-divide-negate: Spark's `div` truncates toward zero while
      // SQL floor-division floors — they agree only on NON-NEGATIVE
      // operands, and logprob_fp is always negative
      .withColumn("avg_fp", expr("-((-logprob_fp) div n_bigrams)"))
  }

  /** Gopher-style rule gate (Rae et al. 2021, appendix A): the published
    * document-quality heuristics as one shuffle-free projection, each
    * rule an EXACT integer comparison so any engine reproduces the
    * verdict bit-for-bit:
    *
    *   - word count within `[minWords, maxWords]`;
    *   - mean word length within `[minMeanLen, maxMeanLen]` — compared
    *     as `total_chars` vs `bound · n_words` cross-multiplications,
    *     never a float mean (total chars = non-whitespace chars, which
    *     equals the sum of token lengths by the `\S+` token contract);
    *   - ≥ 80% of words contain at least one alphabetic character
    *     (`10 · n_alpha_words ≥ 8 · n_words`);
    *   - at least `minStopwords` DISTINCT stop words present (the
    *     "natural prose" signal).
    *
    * Returns every doc with per-rule flags plus the combined `keep` —
    * callers filter on `keep` but audit the flags (the standard corpus
    * triage loop: which rule is rejecting how much).
    */
  def gopherRules(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")): DataFrame =
    gopherFlags(docs.select(col(idCol), col(textCol)), textCol,
      minWords, maxWords, minMeanLen, maxMeanLen, minStopwords, stopwords)
      .select(idCol, "n_words", "ok_words", "ok_mean_len",
        "ok_alpha_words", "ok_stopwords", "keep")

  /** The ONE definition of the Gopher flag computation — a pure narrow
    * projection that APPENDS the flag columns and keeps everything else,
    * so it composes onto a STREAM (llm2's ingest gate) as well as the
    * batch [[gopherRules]] report. Same thresholds, same cross-
    * multiplied integer arithmetic.
    */
  def gopherFlags(
      docs: DataFrame,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Int = 3,
      maxMeanLen: Int = 10,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to")): DataFrame = {
    val nWords = size(col("__w")).cast("long")
    val nAlpha = size(filter(col("__w"),
      t => length(regexp_replace(t, "[^a-z]", "")) > 0)).cast("long")
    val nStop = stopwords.map(s =>
      when(array_contains(col("__w"), s), 1).otherwise(0)).reduce(_ + _)
    docs
      .withColumn("__w", tokens(lower(col(textCol))))
      .withColumn("__nc",
        length(regexp_replace(col(textCol), "\\s", "")).cast("long"))
      .withColumn("n_words", nWords)
      .withColumn("ok_words", nWords >= minWords && nWords <= maxWords)
      // minMeanLen ≤ chars/words ≤ maxMeanLen, cross-multiplied
      .withColumn("ok_mean_len",
        col("__nc") >= nWords * minMeanLen && col("__nc") <= nWords * maxMeanLen)
      .withColumn("ok_alpha_words", nAlpha * 10L >= nWords * 8L)
      .withColumn("ok_stopwords", nStop >= minStopwords)
      .withColumn("keep",
        col("ok_words") && col("ok_mean_len") &&
          col("ok_alpha_words") && col("ok_stopwords"))
      .drop("__w", "__nc")
  }

  /** Corpus-wide PMI collocations (Church & Hanks 1990) over adjacent
    * lowercased-token bigrams — the phrase-mining pass that finds
    * multi-word expressions worth keeping whole during tokenization.
    *
    *   pmi(w1, w2) = ln( c(w1,w2) · N / (c_first(w1) · c_second(w2)) )
    *
    * with N the total bigram count, `c_first`/`c_second` positional
    * unigram counts. Cross-engine determinism: the ratio is computed as
    * `double(c2) · N / (double(cx) · cy)` — the identical IEEE
    * expression tree in any engine — then fixed-pointed to micro-nats
    * (`lmScore`'s recipe, same 1-ulp-at-a-rounding-boundary caveat,
    * same exhaustive oracle verification).
    *
    * Scale shape: bigram fan-out after the standard id repartition;
    * three hash aggregates over the VOCABULARY (≪ corpus); the
    * minCount filter prunes the pair table before any join; the two
    * positional-count joins are vocabulary-sized (AQE broadcasts); the
    * scalar N crosses as a one-row crossJoin. Nothing driver-side.
    *
    * @return (w1, w2, c2, pmi_fp) for pairs with c2 ≥ minCount
    */
  def pmiCollocations(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Int = 5): DataFrame = {
    val base = docs
      .repartition(col(idCol))
      .select(col(idCol), tokens(lower(col(textCol))).as("w"))
      .where(size(col("w")) >= 2)
    val bg = base.select(
        explode(expr(
          "transform(sequence(0, size(w) - 2), i -> named_struct('w1', w[i], 'w2', w[i+1]))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairs = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cx = bg.groupBy("w1").agg(count(lit(1)).as("cx"))
    val cy = bg.groupBy("w2").agg(count(lit(1)).as("cy"))
    val n = bg.agg(count(lit(1)).as("n_bigrams"))
    pairs.where(col("c2") >= minCount)
      .join(cx, Seq("w1")).join(cy, Seq("w2"))
      .crossJoin(n)
      .select(col("w1"), col("w2"), col("c2"),
        round(log(col("c2").cast("double") * col("n_bigrams") /
          (col("cx").cast("double") * col("cy"))) * 1e6, 0).cast("long").as("pmi_fp"))
  }

  /** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
    * merge-table learner upstream of every subword tokenizer. Returns
    * the first `merges` learned merges in order:
    * (merge_rank, lhs, rhs, pair_count).
    *
    * Scale shape: the corpus collapses ONCE to a word-frequency
    * histogram (the classic trick — BPE statistics are a function of
    * the VOCABULARY, which is sublinear in corpus size), and every
    * merge round then runs over vocabulary-sized data: one pair-count
    * aggregation (map-side partial sums), one single-row argmax, one
    * narrow merge-apply pass. Nothing corpus-sized is touched after
    * the histogram; round state is checkpoint-cut like PageRank's.
    *
    * Determinism (the oracle contract): the argmax tie-breaks on
    * (count DESC, lhs ASC, rhs ASC) — binary string order, identical
    * in Spark and any warehouse for the byte-clean tokens this runs
    * on. The merge-apply is engine-portable by construction: a word's
    * symbol list is one string `‖‖s1‖‖s2‖‖…‖‖` (every symbol fenced by
    * DOUBLED separators), and merging (l, r) is the plain string
    * replace of `‖l‖‖r‖` with `‖lr‖` — left-to-right non-overlapping
    * in every engine, and the doubled fences make boundary sharing
    * impossible (each replacement consumes one fence per side and
    * leaves one, so "a a a" merges once, and `|b‖‖c|` can never match
    * inside a symbol ending in b since symbols are separator-free).
    *
    * Symbols are single CODEPOINTS at round 0 (`regexp_extract_all
    * (w, '.')`), so the learner is character-level BPE without an
    * end-of-word marker (merges never cross word boundaries — words
    * are separate rows). Words containing the separator char `|` are
    * dropped (documented contract; mirror the filter in any oracle).
    * If the pair table drains before `merges` rounds, the output has
    * fewer rows.
    */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1 && merges <= 64, s"merges must be in [1, 64], got $merges")
    val sep = "|"
    val sep2 = "||"
    var words = CheckpointCut.cut(docs
      .select(explode(tokens(col(textCol))).as("w"))
      .where(!col("w").contains(sep))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(
        concat(lit(sep2),
          array_join(regexp_extract_all(col("w"), lit("."), lit(0)), sep2),
          lit(sep2)).as("rep"),
        col("freq")))
    // vocabulary-sized (the only corpus-derived relation); the cut keeps
    // the corpus scan out of every round's lineage, reliably
    // checkpointed when a checkpoint dir is set (executor-loss-safe)
    var picks = List.empty[DataFrame]
    for (round <- 1 to merges) {
      val syms = filter(split(col("rep"), "\\|\\|"), x => x =!= "")
      val best = CheckpointCut.cut(words
        .select(col("freq"), syms.as("s"))
        // sequence(0, -1) DESCENDS (the t22 lesson): a fully-merged
        // single-symbol word must not fabricate a bogus pair
        .where(size(col("s")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(0), size(col("s")) - 2),
            i => struct(element_at(col("s"), i + 1).as("l"),
              element_at(col("s"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .select(col("l"), col("r"), col("cnt"), lit(round).as("merge_rank")))
      // one row; ends the round's lineage
      picks = picks :+ best
      val prevWords = words
      words = CheckpointCut.cut(words
        .crossJoin(broadcast(best.select(col("l").as("_l"), col("r").as("_r"))))
        .select(
          replace(col("rep"),
            concat(lit(sep), col("_l"), lit(sep2), col("_r"), lit(sep)),
            concat(lit(sep), col("_l"), col("_r"), lit(sep))).as("rep"),
          col("freq"))) // vocabulary-sized
      CheckpointCut.release(prevWords)
    }
    // the returned union reads only the one-row `best` leaves; the final
    // word table has no readers left
    CheckpointCut.release(words)
    picks.reduce(_ unionByName _)
      .select(col("merge_rank"), col("l").as("lhs"), col("r").as("rhs"),
        col("cnt").as("pair_count"))
  }

  /** BPE ENCODE — the apply half of [[bpeTrain]]: tokenize the corpus
    * with a learned merge table and account tokens per document (the
    * token-budget number every training-data pipeline actually ships:
    * sequence packing, context-window chunking, and corpus mixing all
    * consume a per-doc token count under the REAL tokenizer, not the
    * whitespace proxy).
    *
    * Plan: the corpus collapses to its DISTINCT word table once (same
    * doubled-fence representation as training: `||c1||c2||…||`), the
    * merge table collapses to ONE ROW holding the rank-ordered merge
    * array (a model artifact, like a centroid array — broadcast by
    * construction), and a single `aggregate()` fold applies every merge
    * in rank order as one narrow pass per word — merges are inherently
    * sequential (merge k rewrites what k−1 produced), so they fold, not
    * join. Token counts then reach documents through one word-keyed
    * join + doc-keyed sum, so per-word work is VOCABULARY-sized while
    * per-document work is a count join — never tokens × documents.
    *
    * Contract notes, inherited from [[bpeTrain]]: separator-bearing
    * words (`|`) are dropped from the count; a document whose words all
    * drop (or with no words) is absent from the result. The word-keyed
    * join is zipf-skewed by nature ("the" joins everywhere) — but the
    * skewed side carries only (word, n_tokens), so AQE's skew split or
    * a broadcast of the vocabulary map both resolve it at runtime.
    *
    * @param mergeTable output of [[bpeTrain]] (merge_rank, lhs, rhs)
    * @return (idCol, n_words, n_tokens) — whitespace words counted and
    *         BPE tokens after all merges, per document
    */
  def bpeEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      mergeTable: DataFrame): DataFrame = {
    val sep2 = "||"
    val inst = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .where(!col("w").contains("|"))
    val vocab = inst.groupBy("w").agg(count(lit(1)).as("n_inst"))
      .select(col("w"),
        concat(lit(sep2),
          array_join(regexp_extract_all(col("w"), lit("."), lit(0)), sep2),
          lit(sep2)).as("rep"))
    val mergesRow = mergeTable
      .agg(sort_array(collect_list(struct(
        col("merge_rank"), col("lhs"), col("rhs")))).as("ms"))
    val encoded = vocab.crossJoin(broadcast(mergesRow))
      .select(col("w"),
        size(filter(split(
          aggregate(col("ms"), col("rep"), (acc, m) =>
            replace(acc,
              concat(lit("|"), m.getField("lhs"), lit(sep2), m.getField("rhs"), lit("|")),
              concat(lit("|"), m.getField("lhs"), m.getField("rhs"), lit("|")))),
          "\\|\\|"), x => x =!= "")).as("nt"))
    inst.join(encoded, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("nt")).as("n_tokens"))
  }

  /** Convenience: full text-analysis projection over a documents table. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("*"),
      tokenCount(t).as("n_tokens"),
      bpeishTokenCount(t).as("n_bpeish_tokens"),
      langId(t).as("lang_pred"),
      punctRatio(t).as("punct_ratio"),
      alphaRatio(t).as("alpha_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality_score"),
      fingerprint(t).as("fingerprint")
    )
  }

  /** Per-slice vocabulary statistics — the corpus-health dashboard
    * numbers: type count (distinct words), token count, hapax legomena
    * (words seen exactly once), type-token ratio, and hapax share.
    * What they catch at corpus scale: an OCR-damaged or encoding-
    * mangled slice inflates hapax share (every corruption is a new
    * "word"); a boilerplate-flooded slice collapses TTR; a healthy
    * natural-language slice sits in a stable band of both — so these
    * two ratios are the cheapest per-source quality gate there is.
    *
    * Ratios are floored basis points — integer division over exact
    * counts. Words come from the shared whitespace tokenizer,
    * lowercased (the t5 contract); slices with no words emit no row.
    *
    * Scale shape: ONE (slice, word) map-side-partial aggregate bounds
    * everything after by VOCABULARY size (Heaps' law: ~√corpus), then
    * a slice-grain rollup. The corpus is scanned once; no windows, no
    * broadcasts.
    *
    * @return (slice, n_types, n_tokens, n_hapax, ttr_bp, hapax_bp)
    */
  def vocabularyStats(
      docs: DataFrame,
      sliceCol: String,
      textCol: String): DataFrame = {
    val wc = docs.select(col(sliceCol).as("slice"),
        explode(tokens(lower(col(textCol)))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("slice", "word").agg(count(lit(1)).as("c"))
    wc.groupBy("slice").agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        count(when(col("c") === 1, 1)).as("n_hapax"))
      .withColumn("ttr_bp", expr("(10000 * n_types) div n_tokens"))
      .withColumn("hapax_bp", expr("(10000 * n_hapax) div n_types"))
  }

  /** Jensen–Shannon divergence of each slice's token distribution vs
    * the corpus complement — the VOCABULARY-level drift monitor (PSI
    * reads one numeric column; this reads what the text is actually
    * made of: a new crawl source, a template flood, or an upstream
    * language shift moves token mass long before numeric metadata
    * notices). Symmetric and bounded — 0 = identical mixes,
    * ln 2 ≈ 693147 micro-nats = disjoint vocabularies — so one
    * threshold serves every slice size.
    *
    * Exactness: per shared token, the two KL terms quantize through the
    * shared [[graft.ops.Stats.lnRatioMicroSql]] tree over EXACT integer
    * products (`p/m = 2·cp·n₂ / (cp·n₂ + cq·n₁)` — counts
    * cross-multiplied, no intermediate float shares — the psiTermSql
    * discipline), weighted by integer counts and summed as exact
    * decimals. Tokens ABSENT from the slice contribute `cq·ln 2`
    * exactly, so their whole mass folds into one closed form,
    * `693147·(n₂ − Σ_covered cq)`, off the histogram — no slice×vocab
    * grid is ever materialized. The final division is one positive-mod
    * floor (JSD of near-identical mixes can quantize negative).
    * Magnitude contract: n ≲ 10¹³ tokens keeps n₂·Σterms inside
    * decimal(38).
    *
    * Scale shape: ONE corpus scan into the (slice, word) histogram;
    * word totals, slice totals, and the global total all re-aggregate
    * the histogram (the x42 complement recipe). The vocab-grain join
    * shuffles Heaps-law rows (~√corpus), never documents. A
    * single-slice corpus has no complement → NULL, never a blow-up.
    *
    * @return (key, n_slice, n_rest, n_types, jsd_micro — micro-nats)
    */
  def jsDivergence(
      docs: DataFrame,
      sliceCol: String,
      textCol: String): DataFrame = {
    val wc = jsdHistSlot.persist(
      docs.select(col(sliceCol).as("key"),
          explode(tokens(lower(col(textCol)))).as("word"))
        .where(col("key").isNotNull && length(col("word")) > 0)
        .groupBy("key", "word").agg(count(lit(1)).as("cp")))
    val tot = wc.groupBy("word").agg(sum(col("cp")).as("ct"))
    val sl = wc.groupBy("key")
      .agg(sum(col("cp")).as("n1"), count(lit(1)).as("n_types"))
    val nAll = sl.agg(sum(col("n1")).as("n_all"))
    val terms = wc.join(tot, Seq("word")).join(sl, Seq("key")).crossJoin(nAll)
      .select(col("key"), col("n1"), col("n_types"),
        (col("n_all") - col("n1")).as("n2"),
        col("cp").cast("decimal(19,0)").as("cp"),
        (col("ct") - col("cp")).cast("decimal(19,0)").as("cq"))
      .withColumn("num_p", lit(2) * col("cp") * col("n2"))
      .withColumn("num_q", lit(2) * col("cq") * col("n1"))
      .withColumn("den", col("cp") * col("n2") + col("cq") * col("n1"))
      // den = 0 only when the slice IS the whole corpus (n2 = 0, cq = 0)
      // — the NULL-report case; guard so ANSI division never fires
      .withColumn("term_p",
        when(col("den") > 0,
          col("cp") * expr(graft.ops.Stats.lnRatioMicroSql("num_p", "den")))
          .otherwise(lit(0)))
      .withColumn("term_q",
        when(col("cq") > 0,
          col("cq") * expr(graft.ops.Stats.lnRatioMicroSql("num_q", "den")))
          .otherwise(lit(0)))
    terms.groupBy("key")
      .agg(max(col("n1")).as("n_slice"), max(col("n2")).as("n_rest"),
        max(col("n_types")).as("n_types"),
        sum(col("term_p")).as("stp"),
        sum(col("term_q")).as("stq_cov"),
        sum(col("cq")).as("sq_cov"))
      // the uncovered rest-mass closed form: every token the slice has
      // never seen contributes exactly cq·ln 2
      .withColumn("stq",
        col("stq_cov") + lit(693147L) * (col("n_rest") - col("sq_cov")))
      .withColumn("aa",
        col("n_rest").cast("decimal(19,0)") * col("stp")
          + col("n_slice").cast("decimal(19,0)") * col("stq"))
      .withColumn("bb",
        lit(2L).cast("decimal(19,0)") * col("n_slice") * col("n_rest"))
      .withColumn("jsd_micro",
        when(col("n_rest") > 0,
          expr("CAST((aa - ((aa % bb + bb) % bb)) div bb AS BIGINT)")))
      .select("key", "n_slice", "n_rest", "n_types", "jsd_micro")
  }

  /** Flesch–Kincaid-style readability grade per document — the classic
    * complexity feature for quality filtering and curriculum ordering
    * (grade ≈ US school years: ~5 easy prose, ~12 dense, negative on
    * telegraphic fragments). `grade = 0.39·(W/S) + 11.8·(Y/W) − 15.59`
    * with W words (the t5 tokenizer), S sentences (runs of `.!?`,
    * floored at 1 so fragments don't divide by zero), and Y a
    * deterministic syllable PROXY — vowel-group runs (`[aeiouy]+`),
    * floored at 1. The proxy is the standard cheap estimator; it is
    * biased low on hiatus words, identically in both engines, which is
    * what a FILTER feature needs (monotone comparability, not
    * linguistic truth).
    *
    * Exactness: the grade is floored MILLI-units over the common
    * denominator — `(390·W² + 11800·Y·S − 15590·S·W) / (S·W)` — exact
    * decimal products, positive-mod floor (grades go negative). One
    * narrow codegen pass, no shuffles, no UDFs.
    *
    * @return (idCol, n_words, n_sentences, n_syllables, fk_grade_milli)
    *         for documents with ≥ 1 word
    */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_words"),
        greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1))
          .cast("long").as("n_sentences"),
        greatest(regexp_count(lower(col(textCol)), lit("[aeiouy]+")), lit(1))
          .cast("long").as("n_syllables"))
      .where(col("n_words") > 0)
      .withColumn("num", expr(
        """390 * CAST(n_words AS DECIMAL(18,0)) * n_words
           + 11800 * CAST(n_syllables AS DECIMAL(18,0)) * n_sentences
           - 15590 * CAST(n_sentences AS DECIMAL(18,0)) * n_words"""))
      .withColumn("den", expr("CAST(n_sentences AS DECIMAL(18,0)) * n_words"))
      .withColumn("fk_grade_milli",
        expr("CAST((num - ((num % den + den) % den)) div den AS BIGINT)"))
      .drop("num", "den")

  /** Zipf rank-frequency slope per slice — the one-number corpus-shape
    * gate [[vocabularyStats]]'s ratios can't give: a natural-language
    * slice's log-log rank-frequency line slopes ≈ −1 (Zipf's law);
    * template/boilerplate flooding flattens the head (slope → 0),
    * ID/hash contamination steepens past −1.5 with a broken fit. Emits
    * the OLS slope over the top `topRanks` (rank, frequency) points in
    * log-log space, plus the fit's Pearson r (|r| near 1 = clean line).
    *
    * Determinism: ranks are exact (`row_number` over frequency DESC,
    * word ASC — total order), each point quantizes to micro-nat LONGs
    * (`round(ln·1e6)` — the t19 recipe, same 1-ulp caveat), the OLS
    * moments are exact decimal sums (the e32 recipe) with the slope in
    * positive-mod FLOORED micro-units (slopes are negative — bare
    * integer division truncates upward), and r rides the shared
    * [[Stats.corrSql]] IEEE tree.
    *
    * Scale shape: one (slice, word) map-side-partial aggregate bounds
    * everything by vocabulary size (Heaps: ~√corpus); the rank window
    * partitions by slice over that vocabulary-sized relation; the
    * moment aggregate sees ≤ topRanks rows per slice.
    *
    * @return (slice, n_ranks, slope_micro, fit_corr) for slices with
    *         ≥ 2 distinct frequencies among the top ranks
    */
  def zipfSlope(
      docs: DataFrame,
      sliceCol: String,
      textCol: String,
      topRanks: Int = 500): DataFrame = {
    require(topRanks >= 2, s"need at least 2 ranks, got $topRanks")
    import org.apache.spark.sql.expressions.Window
    val wc = docs.select(col(sliceCol).as("slice"),
        explode(tokens(lower(col(textCol)))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("slice", "word").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("slice").orderBy(col("c").desc, col("word").asc)
    val pts = wc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topRanks)
      .select(col("slice"),
        expr("CAST(ROUND(LN(CAST(rank AS DOUBLE)) * 1000000, 0) AS BIGINT)").as("x"),
        expr("CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1000000, 0) AS BIGINT)").as("y"))
    pts.groupBy("slice").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")).as("sxx"),
        sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("sxy"),
        sum(col("y").cast("decimal(19,0)") * col("y").cast("decimal(19,0)")).as("syy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .where(col("den") > 0)
      .withColumn("slope_micro", expr(
        "CAST((1000000 * num - ((1000000 * num % den + den) % den)) div den AS BIGINT)"))
      .withColumn("fit_corr", expr(graft.ops.Stats.corrSql("sxy", "sx", "sy", "sxx", "syy")))
      .select(col("slice"), col("n").as("n_ranks"), col("slope_micro"), col("fit_corr"))
  }
}

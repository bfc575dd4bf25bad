package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite corpus curation — the end-to-end shape of a training-data
  * preparation pipeline, composed from the engine's own operators:
  *
  *   1. quality gate: token count + alphabetic-density thresholds
  *      ([[TextAnalysis]] heuristics, C4/Gopher-style);
  *   2. exact dedup: one survivor (lowest id) per md5 of the text;
  *   3. near-dup removal: among survivors, greedy drop of the HIGHER id
  *      of every n-gram-Jaccard pair ≥ threshold.
  *
  * The near-dup step defaults to [[Dedup.minhashNearDup]] — the
  * LSH-bounded 100 TB path. NOTE for callers upgrading from v0.1: this
  * default CHANGED from exact inverted-index pairs to LSH; pass
  * `useLsh = false` to keep the old plan. The output contract is meant
  * to be identical ([[Dedup.ngramJaccardPairs]] equivalence): every
  * candidate is verified with exact Jaccard, and candidate-recall at
  * the threshold is 1-(1-t^r)^b ≈ 1-5e-8 for t=0.8 — but that equality
  * is PROBABILISTIC (a near-threshold pair can miss all bands with
  * p≈5e-8). It is verified exhaustively against the exact oracle at
  * sf0.01/sf0.1; re-verify at each new scale rather than assuming it.
  *
  * Greedy-by-id is deterministic and single-pass; it is NOT a transitive
  * clustering (A~B, B~C with A≁C still drops both B and C). That is the
  * standard choice for dedup-before-training, documented here as the
  * contract.
  */
object Corpus {

  /** sourceOverlap's distinct (slice, shingle) relation feeds the size
    * aggregate and BOTH sides of the self-join — without the slot the
    * corpus is shingled three times (the e39/v22 multi-consumer
    * lesson).
    */
  private val overlapSlot = new CacheSlot

  /** The shared gate + exact-dedup head of [[curate]] and
    * [[curateClustered]]: quality thresholds (token count, alphabetic
    * density), then keep the smallest id per exact-text (md5) group.
    * ONE definition — the two curation policies must gate identical
    * survivor sets.
    */
  private def gateAndExactDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int,
      minAlphaRatio: Double): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)
    val gated = docs.select(
        id, text,
        TextAnalysis.tokenCount(text).cast("long").as("n_tokens"),
        TextAnalysis.alphaRatio(text).as("alpha_ratio"))
      .where(col("n_tokens") >= minTokens && col("alpha_ratio") >= minAlphaRatio)
    val w = Window.partitionBy(md5(text)).orderBy(id.asc)
    gated.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }

  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 10,
      minAlphaRatio: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      n: Int = 3,
      useLsh: Boolean = true): DataFrame = {
    val id = col(idCol)
    val exactKept = gateAndExactDedup(docs, idCol, textCol, minTokens, minAlphaRatio)

    // LSH pairs are computed on the ORIGINAL corpus and then restricted
    // to surviving docs: near-duplicate similarity is a pairwise
    // property (a kept pair's Jaccard, bands, and verification do not
    // depend on other docs), so the result is identical — and the plan
    // equals every other consumer's (d2, d6, t11), letting them share
    // ONE cached signature table instead of each building their own.
    val pairs =
      if (useLsh) restrictPairs(
        Dedup.minhashNearDup(docs, idCol, textCol, jaccardThreshold, n), exactKept, idCol)
      else Dedup.ngramJaccardPairs(exactKept, idCol, textCol, jaccardThreshold, n)
    val dropIds = pairs.select(col("id_b").as(idCol)).distinct()

    exactKept
      .join(dropIds, Seq(idCol), "left_anti")
      .select(id, col("n_tokens"), col("alpha_ratio"))
  }

  /** Cluster-based curation: same gate + exact dedup as [[curate]], but
    * near-duplicates are removed per CONNECTED COMPONENT (keep the
    * smallest surviving id of each near-dup cluster) instead of greedily
    * per pair — the principled policy [[curate]]'s scaladoc contrasts
    * itself against (A~B, B~C keeps A only, never both dropped).
    *
    * Cluster membership is a property of the CORPUS, not of the gate:
    * components are computed over the full near-dup pair graph of
    * `pairCorpus` (so a chain A~X~C still links A and C when X itself
    * was gated out or exact-deduped away), then each cluster keeps its
    * smallest SURVIVING doc. Besides being the more aggressive — and for
    * training-data dedup, safer — policy, this makes the component
    * computation independent of this call's gate parameters: every
    * consumer of the same corpus (cluster listing, curation, the
    * capstone pipeline) shares ONE converged label table
    * ([[Dedup.connectedComponents]] memoizes it by pair-plan equality,
    * exactly like the shared signature table).
    *
    * @param pairCorpus corpus to compute near-dup pairs on (defaults
    *        to `docs`). Pass the UNFILTERED parent table when `docs` is
    *        a slice of it — the unfiltered plan then equals every other
    *        consumer's, sharing the cached signature AND label tables.
    */
  def curateClustered(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 10,
      minAlphaRatio: Double = 0.5,
      jaccardThreshold: Double = 0.8,
      n: Int = 3,
      pairCorpus: Option[DataFrame] = None): DataFrame = {
    val id = col(idCol)
    val exactKept = gateAndExactDedup(docs, idCol, textCol, minTokens, minAlphaRatio)

    val labels = Dedup.connectedComponents(
      Dedup.minhashNearDup(pairCorpus.getOrElse(docs), idCol, textCol, jaccardThreshold, n))
    // labels restricted to survivors; keep each cluster's smallest
    // surviving id, drop the rest (docs in no pair have no label row and
    // survive untouched)
    val keptLabels = labels
      .join(exactKept.select(id.as("doc_id")), Seq("doc_id"), "left_semi")
    val dropIds = keptLabels
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("cluster_id"))))
      .where(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id").as(idCol))

    exactKept
      .join(dropIds, Seq(idCol), "left_anti")
      .select(id, col("n_tokens"), col("alpha_ratio"))
  }

  /** Keep only pairs whose BOTH endpoints survive in `kept`. */
  private def restrictPairs(pairs: DataFrame, kept: DataFrame, idCol: String): DataFrame = {
    val ids = kept.select(col(idCol))
    pairs
      .join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
      .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
  }

  /** Deterministic train/val/test assignment: bucket 0-99 from the
    * first 8 md5 hex digits of the id, split by cumulative percentage.
    * Content-stable (the same id lands in the same split on any engine,
    * any run, any partitioning — md5 is portable, unlike engine hash
    * functions), which is what makes the split auditable by warehouse
    * SQL and reproducible across reshards.
    */
  /** The portable content-stable bucket shared by [[assignSplit]] and
    * [[sampleStratified]] (and mirrored by their warehouse oracles):
    * first 8 md5 hex digits of the stringified id, mod `buckets`. ONE
    * definition — the split and the sampler must never drift apart.
    */
  private def md5Bucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  def assignSplit(
      docs: DataFrame,
      idCol: String,
      trainPct: Int = 90,
      valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "need a non-empty test split")
    val bucket = md5Bucket(col(idCol), 100).as("bucket")
    docs.select(col(idCol), bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("bucket")
  }

  /** Split-leakage gate: how many val/test documents' EXACT text also
    * appears in the reference (train) split? The classic silent eval
    * bug — [[assignSplit]] is id-keyed, so duplicated CONTENT lands in
    * different splits and inflates every held-out metric; this is the
    * check a pipeline runs right after splitting (exact-hash tier —
    * near-dup leakage is [[decontaminate]]'s n-gram business).
    *
    * Scale shape (the x15 discipline): one scan into the
    * (text-md5, split) histogram; the reference-membership flag is a
    * hash-partitioned window over that histogram (hash-grain, never
    * rows), one split-grain rollup after. All-integer, floored-bp
    * share.
    *
    * @param df pre-split corpus: one row per doc with splitCol + textCol
    * @return one row per non-reference split: (split, n_docs, n_leaked,
    *         leak_bp)
    */
  def splitLeakage(
      df: DataFrame,
      splitCol: String,
      textCol: String,
      refSplit: String = "train"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = df
      .select(col(splitCol).as("split"), md5(col(textCol)).as("h"))
      .where(col("h").isNotNull)
      .groupBy("h", "split").agg(count(lit(1)).as("c"))
    c.withColumn("in_ref",
        max(when(col("split") === refSplit, 1).otherwise(0))
          .over(Window.partitionBy("h")))
      .where(col("split") =!= refSplit)
      .groupBy("split")
      .agg(sum(col("c")).as("n_docs"),
        sum(when(col("in_ref") === 1, col("c")).otherwise(0L)).as("n_leaked"))
      .withColumn("leak_bp", expr("(10000 * n_leaked) div n_docs"))
  }

  /** Deterministic stratified corpus mixing — the domain-reweighting
    * pass of a training-data pipeline (e.g. keep all English, half the
    * German, a third of the Chinese). Per-stratum keep rates are BASIS
    * POINTS (0..10000); a document survives iff its md5 bucket
    * (0..9999, from the id — same portable content-stable mechanics as
    * [[assignSplit]]) falls below its stratum's rate. Strata absent
    * from the map keep `defaultBps`.
    *
    * Scale shape: one narrow md5 projection + a broadcast join against
    * the (tiny) weights table — no shuffle of the corpus, and the same
    * document survives identically on any engine, any partitioning, any
    * resharding (warehouse SQL can audit the exact kept set).
    */
  def sampleStratified(
      docs: DataFrame,
      idCol: String,
      strataCol: String,
      bpsByStratum: Map[String, Int],
      defaultBps: Int = 0): DataFrame = {
    require((bpsByStratum.values ++ Seq(defaultBps)).forall(b => b >= 0 && b <= 10000),
      "keep rates are basis points in [0, 10000]")
    val spark = docs.sparkSession
    val weights = spark.createDataFrame(bpsByStratum.toSeq)
      .toDF(strataCol, "keep_bps")
    docs.join(broadcast(weights), Seq(strataCol), "left")
      .where(md5Bucket(col(idCol), 10000) < coalesce(col("keep_bps"), lit(defaultBps)))
      .drop("keep_bps")
  }

  /** Paragraph-level exact deduplication — the line/paragraph pass of a
    * training-data pipeline (C4, RefinedWeb; Lee et al. 2021 ch. 3
    * motivates why sub-document dedup matters beyond whole-doc): split
    * each document on `sep`, keep only the FIRST corpus-wide occurrence
    * of every distinct paragraph (ordered by (id, position) — fully
    * deterministic), and reassemble each document from its surviving
    * paragraphs in their original order. Documents whose every paragraph
    * was seen earlier disappear (the standard drop-empty-docs policy).
    *
    * Scale shape: paragraphs shuffle ONCE on `md5(para)` — a fixed-width
    * uniform key, the same mechanics as [[Dedup.exact]], so boilerplate
    * paragraphs repeated millions of times hash to one partition's
    * groups without dragging their text through a sort on the string
    * itself. Digest equality IS the identity contract (same as
    * [[Dedup.exact]]): an md5 collision between distinct paragraphs
    * would silently merge them — accepted, not re-verified, at 2^-64
    * collision scale; the first-occurrence filter is a rank-1 window
    * (WindowGroupLimit cuts each group to 1 row map-side before the
    * exchange); reassembly is one groupBy on the doc id. Linear in
    * corpus size — no all-pairs stage anywhere.
    *
    * @return (idCol, textCol [reassembled], n_kept) — docs with ≥1
    *         surviving paragraph only
    */
  def dedupParagraphs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n\n"): DataFrame = {
    val id = col(idCol)
    // spread docs before the paragraph fan-out — the split/explode and
    // the per-paragraph md5 otherwise run at the input's partitioning
    // (one small file = one task hashing the whole corpus)
    val par = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val paras = docs
      .where(col(textCol).isNotNull)
      .repartition(par, id)
      .select(id, posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
    // 16-byte binary digest (not hex) — the group key rides the exchange
    val w = Window.partitionBy(unhex(md5(col("para")))).orderBy(id.asc, col("pos").asc)
    paras
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(id)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("para")))), x => x("para")),
          sep).as(textCol),
        count(lit(1)).as("n_kept"))
  }

  /** Deterministic fixed-length sequence packing — the batch-assembly
    * pass of an LLM training pipeline: documents are laid head-to-tail
    * in a content-stable order and cut into `seqLen`-token training
    * sequences. Emits, per document, its token offset and the first/last
    * sequence ids it lands in (seq_first < seq_last ⇔ the document
    * crosses a sequence boundary — the standard concat-then-slice
    * packing, not per-doc padding).
    *
    * The corpus packs independently within `shards` content-stable
    * shards (md5 buckets of the id — the same portable mechanics as
    * [[assignSplit]]): the running-offset window is partitioned by
    * shard, so the cumulative sum parallelizes across shards instead of
    * serializing the corpus through one global ordering. Set
    * shards ≫ executor count at cluster scale — each shard is one
    * window partition. Within a shard the layout is fully deterministic
    * (ordered by id): the same corpus packs identically on any engine,
    * any partitioning, any reshard, and warehouse SQL can audit the
    * exact layout.
    *
    * Empty documents (0 tokens) occupy no token span; they are assigned
    * the sequence their offset falls in (seq_first = seq_last).
    */
  /** @param tokenCountCol name of a precomputed per-doc token-count
    *        column to use instead of re-scanning `textCol` — pipelines
    *        that already gated on token count (t17) pass it so the
    *        corpus text is tokenized once, not twice
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int = 2048,
      shards: Int = 256,
      tokenCountCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(shards > 0, s"shards must be positive, got $shards")
    val id = col(idCol)
    val nTokens = tokenCountCol
      .map(c => col(c).cast("long"))
      .getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val base = docs.where(col(textCol).isNotNull).select(
      id,
      md5Bucket(id, shards).as("shard"),
      nTokens.as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(id.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("tok_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_first", expr(s"tok_offset div $seqLen"))
      .withColumn("seq_last",
        expr(s"(tok_offset + greatest(n_tokens, 1) - 1) div $seqLen"))
  }

  /** Benchmark decontamination (the standard pre-training hygiene pass):
    * flag every training doc sharing at least one word `n`-gram with an
    * evaluation set. The eval shingle set is tiny and broadcasts; the
    * train side streams through one shingle pass + one inverted join —
    * no train-train comparison, linear in corpus size.
    *
    * @return (idCol, n_shared_ngrams) — contaminated train docs only
    */
  /** URL blocklist filtering by DOMAIN SUFFIX — the C4/RefinedWeb URL
    * gate: a pattern `example.com` blocks the host itself and every
    * subdomain (`a.b.example.com`), never `notexample.com`. The match
    * is exact label-suffix equality, computed scalably: each host
    * reverses its labels (`com.example.b.a`) and explodes its ≤ depth
    * label-PREFIXES; patterns reverse once into a (presumably small,
    * but not broadcast-hinted) lookup; blocking is one equi-join on
    * the prefix string. Fan-out is bounded by label depth (hosts have
    * ~3-6 labels), and no LIKE/regex scan ever runs against the corpus
    * — suffix semantics become hash-joinable keys, the only shape that
    * survives a 10^11-row URL table.
    *
    * Both sides NORMALIZE before matching — lowercase plus trailing
    * root-dot strip — because DNS names are case-insensitive and
    * `example.com.` is the same fully-qualified host as `example.com`:
    * an uppercase host or a root-dotted crawl URL must not slip past
    * the gate (the C4/RefinedWeb gates normalize the same way).
    *
    * @param urls     (idCol, hostCol) relation — one row per document
    * @param patterns one-column relation of blocked domains (apex or
    *                 subdomain, no wildcards — the suffix rule IS the
    *                 wildcard)
    * @return (idCol, matched_pattern) — blocked docs only, the
    *         LONGEST matching pattern per doc (deterministic: most
    *         specific wins; ties impossible, suffixes of one host
    *         differ in length)
    */
  def urlBlocklist(
      urls: DataFrame,
      idCol: String,
      hostCol: String,
      patterns: DataFrame,
      patternCol: String): DataFrame = {
    // DNS normalization: case-fold and strip one trailing root dot on
    // BOTH sides (hosts and patterns) so 'CDN.Example.COM' and
    // 'example.com.' match the entry 'example.com'
    val norm = (c: Column) => regexp_replace(lower(c), "\\.$", "")
    val rev = (c: Column) => array_join(reverse(split(norm(c), "\\.")), ".")
    val hostPrefixes = urls.select(col(idCol), split(rev(col(hostCol)), "\\.").as("ls"))
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(ls)), k -> array_join(slice(ls, 1, k), '.'))")).as("rp"))
    val pats = patterns.select(rev(col(patternCol)).as("rp"),
      col(patternCol).as("matched_pattern"))
    hostPrefixes.join(pats, Seq("rp"))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("matched_pattern")).as("l"),
        col("matched_pattern").as("p"))).as("m"))
      .select(col(idCol), col("m.p").as("matched_pattern"))
  }

  /** URL canonicalization — the C4/RefinedWeb first-pass dedup key:
    * crawls hit the same page through case-variant hosts, tracking
    * params, default ports, fragments, and `www.` aliases, and the
    * cheapest dedup in the whole pipeline is collapsing those BEFORE
    * any content hashing. Canonical form, in order:
    *
    *   1. fragment dropped (`#…` is client-side);
    *   2. scheme lowercased;
    *   3. host lowercased, default port (`:80`/`:443`) stripped,
    *      trailing root dots stripped, one leading `www.` stripped;
    *   4. tracking params removed (`utm_*`, `fbclid`, `gclid`, `ref`)
    *      with separator repair, then any dangling `?`/`&` trimmed —
    *      CONTENT params are kept, in their original order (full
    *      param sorting is deliberately out: it canonicalizes more
    *      but breaks servers that are order-sensitive; the trackers
    *      are the noise that actually fragments crawl keys).
    *
    * Everything is codegen'd string/regexp work — zero UDFs, one
    * projection — and the expression is replayable in any engine with
    * global regexp replace (the oracle does, in DuckDB's dialect).
    * Contract: the input carries an explicit `scheme://` (crawl
    * frontiers do; scheme-relative fragments are upstream's problem).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // lower() preserves length, so the scheme's length locates '://'
    val scheme = lower(split_part(noFrag, lit("://"), lit(1)))
    val rest = noFrag.substr(length(scheme) + lit(4), length(noFrag))
    val hostport = split_part(rest, lit("/"), lit(1))
    val pathq = rest.substr(length(hostport) + lit(1), length(rest))
    // strip only the SCHEME'S default port: http://host:443/p and
    // http://host/p are genuinely distinct origins — a blanket
    // ":(80|443)" strip would collapse them into one canonical key and
    // silently drop a distinct document (CASE on the already-extracted
    // scheme keeps the chain codegen-only and oracle-replayable)
    val portless = when(scheme === "http", regexp_replace(lower(hostport), ":80$", ""))
      .when(scheme === "https", regexp_replace(lower(hostport), ":443$", ""))
      .otherwise(lower(hostport))
    val host = regexp_replace(regexp_replace(
      portless, "\\.+$", ""), "^www\\.", "")
    // tracker removal takes the LEADING separator with it (the
    // separator anchors the param name — 'preref=2' must not lose its
    // 'ref=2' tail), then the first surviving '&' is promoted back to
    // '?' and any dangling separators trimmed
    val cleanPathq = regexp_replace(regexp_replace(regexp_replace(
      pathq, "[?&](utm_[^&=#?]*|fbclid|gclid|ref)=[^&]*", ""),
      "^([^?&]*)&", "$1?"), "[?&]+$", "")
    concat(scheme, lit("://"), host, cleanPathq)
  }

  /** Dedup by canonical URL: smallest id per canonical key survives
    * (content-stable, order-immune). One projection + one key-
    * partitioned min aggregate — the cheapest tier of the dedup stack.
    *
    * @return (canonical_url, survivor id, n_aliases)
    */
  def dedupByCanonicalUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("id"), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("id")).as("id"), count(lit(1)).as("n_aliases"))

  /** Per-document n-gram NOVELTY against a reference corpus: what
    * fraction of a doc's distinct word n-grams has the reference never
    * seen? The incremental-crawl scoring step — a new batch that is
    * mostly old shingles is re-crawl/boilerplate (skip it), one that
    * is mostly novel is fresh content (keep it); also the diversity
    * complement of decontamination (which asks about FORBIDDEN
    * overlap, where this asks about ANY overlap).
    *
    * Unlike [[decontaminate]] the reference is NOT broadcast — it is
    * the full existing corpus, so the membership probe is a
    * shingle-grain shuffle LEFT join against the reference's distinct
    * shingle set (one inverted-index join, linear in both sides, no
    * doc-doc comparison). The ratio is floored basis points — integer
    * division, engine-exact. Docs shorter than `n` tokens contribute
    * their whole text as one shingle (the shared kernel's contract).
    *
    * @return (idCol, n_ngrams — distinct shingles, n_novel,
    *         novelty_bp)
    */
  def ngramNovelty(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val dg = docs.select(col(idCol),
        explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .distinct()
    val rg = reference
      .select(explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .distinct()
    dg.join(rg.withColumn("hit", lit(1)), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        count(when(col("hit").isNull, 1)).as("n_novel"))
      .withColumn("novelty_bp", expr("(10000 * n_novel) div n_ngrams"))
  }

  /** Per-group quota cap — the C4 per-domain limit: keep at most
    * `maxPerGroup` documents per group (domain/source), best-first by
    * (score DESC, id ASC) so the survivors are deterministic. A single
    * over-represented domain otherwise dominates a language's mix
    * silently (the d15 overlap matrix finds WHICH domains; this is the
    * enforcement). Planned as a rank-filter window — Spark rewrites it
    * to WindowGroupLimit, so each group keeps a bounded heap below the
    * exchange, never a full sort.
    *
    * @return the surviving rows: (idCol, groupCol, score, rank)
    */
  def capPerGroup(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: String,
      maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be >= 1, got $maxPerGroup")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), col(groupCol),
      col(scoreCol).cast("long").as("score"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("score").desc, col(idCol).asc)
    base.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= maxPerGroup)
  }

  /** Token-blocklist gate — the C4 "bad words" filter: flag every
    * document containing ANY blocked token (exact lowercased whitespace
    * tokens, the t5 tokenizer — substring matching would flag
    * "classic" for "ass", the classic false-positive this formulation
    * avoids). Returns the input with a `blocked` 0/1 column so the gate
    * composes into funnels; one codegen `arrays_overlap` per row, the
    * blocklist a constant array — no joins, no shuffles.
    */
  def wordBlocklist(
      docs: DataFrame,
      textCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist")
    docs.withColumn("blocked",
      arrays_overlap(
        graft.ops.TextAnalysis.tokens(lower(col(textCol))),
        array(blocked.map(w => lit(w.toLowerCase)): _*)).cast("int"))
  }

  /** Quality-aware dedup survivor selection: given near-dup PAIRS,
    * cluster them (connected components) and keep the HIGHEST-QUALITY
    * member of each cluster instead of the smallest id — the survivor
    * policy real pipelines use (C4 keeps the longest document; a
    * quality-classifier score slots in the same way). Unpaired
    * documents are their own cluster and survive trivially.
    *
    * Determinism: survivor = lexicographic struct-min of
    * (−score, id) — highest score, smallest id on ties. Cluster labels
    * are [[graft.ops.Dedup.connectedComponents]]'s min-id components
    * (reliable-checkpoint rounds at cluster scale).
    *
    * Scale shape: CC over the pairs (pairs-sized, never the corpus),
    * one id-grain left join, one cluster-grain aggregate.
    *
    * @param scoreCol integer-valued quality (length, classifier bp, …)
    * @return one SURVIVOR row per cluster: (idCol, cluster, n_members,
    *         score)
    */
  def dedupKeepBest(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String,
      scoreCol: String): DataFrame = {
    val labels = graft.ops.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    docs.select(col(idCol).as("id"), col(scoreCol).cast("long").as("score"))
      .join(labels, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster_id"), col("id")))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("score")).as("ns"), col("id").as("id"))).as("best"))
      .select(col("best.id").as(idCol), col("cluster"), col("n_members"),
        (-col("best.ns")).as("score"))
  }

  /** Cross-source duplication matrix: distinct-shingle Jaccard and
    * overlap coefficient for every SLICE PAIR — the "which of my crawl
    * sources are republishing each other" heatmap that decides whether
    * two sources should share a dedup pass or a mixing quota (a mirror
    * site inflates its language's weight silently unless this is
    * checked before [[ngramNovelty]]-style incremental gates).
    *
    * Exactness: all-integer — distinct (slice, shingle) sets, shared
    * counts from one shingle-grain self-join, Jaccard
    * `|∩| / (|A|+|B|−|∩|)` and overlap `|∩| / min(|A|,|B|)` in floored
    * basis points. The FULL slice-pair grid emits (the Benford/χ²
    * discipline): a pair sharing nothing surfaces as 0 rather than
    * vanishing — zero overlap between supposed mirrors is exactly as
    * informative as high overlap between supposed strangers.
    *
    * Scale shape: one corpus scan into the distinct (slice, shingle)
    * relation ([[graft.functions.NGramShingles]] dedups within doc —
    * the d7 kernel); the self-join is shingle-grain and each shingle
    * contributes at most |slices|² pair rows (slices are few by
    * definition — sources, not documents), so hub shingles cannot blow
    * up. The grid is a slices² cross of the tiny size relation.
    *
    * @return one row per unordered pair (slice_a < slice_b): (slice_a,
    *         slice_b, n_a, n_b, n_shared, jaccard_bp, overlap_bp)
    */
  def sourceOverlap(
      docs: DataFrame,
      sliceCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val sg = overlapSlot.persist(docs
      .select(col(sliceCol).as("slice"),
        explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .where(col("slice").isNotNull)
      .distinct())
    val sizes = sg.groupBy("slice").agg(count(lit(1)).as("n_sh"))
    val shared = sg.select(col("slice").as("slice_a"), col("g"))
      .join(sg.select(col("slice").as("slice_b"), col("g")), Seq("g"))
      .where(col("slice_a") < col("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(count(lit(1)).as("n_shared"))
    sizes.select(col("slice").as("slice_a"), col("n_sh").as("n_a"))
      .join(sizes.select(col("slice").as("slice_b"), col("n_sh").as("n_b")),
        col("slice_a") < col("slice_b"))
      .join(shared, Seq("slice_a", "slice_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard_bp",
        expr("(10000 * n_shared) div (n_a + n_b - n_shared)"))
      .withColumn("overlap_bp",
        expr("(10000 * n_shared) div least(n_a, n_b)"))
      .select("slice_a", "slice_b", "n_a", "n_b", "n_shared",
        "jaccard_bp", "overlap_bp")
  }

  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val tg = train.select(col(idCol),
      explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .distinct()
    tg.join(broadcast(eg), Seq("g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"))
  }

  /** Overlap-FRACTION decontamination (the PaLM/GPT-3 appendix-C
    * variant of [[decontaminate]]): a training doc is contaminated when
    * at least `minShareBp` basis points of its DISTINCT word `n`-grams
    * appear in the evaluation set — a ratio, so long documents that
    * merely glance off an eval phrase survive while short quotes get
    * flagged. The comparison is integer cross-multiplication
    * (`shared * 10000 ≥ total * bp`), never a float ratio, so the
    * decision is exact and engine-portable.
    *
    * Same scale shape as [[decontaminate]]: the eval shingle set is
    * distinct + broadcast (eval benchmarks are small by definition); the
    * train side is one shingle-kernel pass + one join — linear in corpus
    * size, no train-train comparison. The per-doc totals ride the same
    * aggregate as the hit counts (a LEFT join against the eval set with
    * hit counting), so the fraction costs nothing extra.
    *
    * @return (idCol, n_ngrams, n_shared) — contaminated train docs only
    */
  def decontaminateFuzzy(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      minShareBp: Long = 500L): DataFrame = {
    require(minShareBp > 0 && minShareBp <= 10000,
      s"minShareBp must be in (0, 10000], got $minShareBp")
    // ngram_shingles is distinct-per-doc by construction, so count(*)
    // after the explode IS the doc's distinct-shingle total
    val tg = train.select(col(idCol),
      explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .distinct()
      .withColumn("hit", lit(1))
    tg.join(broadcast(eg), Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_shared"))
      .where(col("n_shared") * 10000L >= col("n_ngrams") * minShareBp)
  }

  /** Deterministic fixed-SIZE sample: exactly `min(k, |stratum|)` rows
    * per stratum, chosen by the k smallest md5-priorities — the
    * count-based complement of [[sampleStratified]]'s rate-based
    * mixing (rates compose corpora; fixed counts build eval slices,
    * per-source inspection samples, k-shot pools). Content-stable like
    * every sampling op here: the priority is md5 of the id's decimal
    * string, so membership survives reruns, row order, and engine
    * changes, and adding rows to a stratum only ever displaces the
    * highest surviving priority.
    *
    * The plan is the top-k scale path, not a window: per-stratum
    * `row_number` over md5 order would shuffle EVERY row to sort each
    * stratum; the bounded-heap aggregate
    * ([[graft.functions.TopKByScoreStr]], constant score — the heap's
    * id-ASC tie-break IS the priority order) folds each partition down
    * to k candidates per stratum before the exchange, so the shuffle
    * carries ≈ partitions·strata·k rows regardless of stratum size.
    * The heap key is `md5hex ‖ id` — md5 is fixed-width, so binary
    * order on the concatenation equals (priority, id) order and the id
    * rides along for free.
    *
    * @return strataCols + (idCol, sample_rank 1..k in priority order)
    */
  def sampleFixedPerStratum(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(strataCols.nonEmpty, "strataCols must be non-empty")
    val key = concat(md5(col(idCol).cast("string")), col(idCol).cast("string"))
    df.groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKAgg
        .top_k_by_score_str(lit(0.0), key, k).as("tk"))
      .select(strataCols.map(col) :+ posexplode(col("tk")): _*)
      .select(strataCols.map(col) ++ Seq(
        // md5 hex is exactly 32 chars; the tail is the id's string form,
        // cast back to the caller's id type (decimal strings round-trip
        // integral/decimal types exactly)
        substring(col("col.neighbor_id"), 33, Int.MaxValue)
          .cast(df.schema(idCol).dataType).as(idCol),
        (col("pos") + 1).as("sample_rank")): _*)
  }

  /** WEIGHTED sampling without replacement, k per stratum (or global
    * with empty `strataCols`) — Efraimidis–Spirakis 2006: draw u ~
    * U(0,1) per record, rank by u^(1/w); the top-k are a weighted
    * sample without replacement. This is the importance-sampling
    * companion to [[sampleFixedPerStratum]]'s uniform draw: corpus
    * curation uses it to keep a fixed budget biased toward quality
    * scores / token counts without a hard cutoff.
    *
    * Determinism discipline (the whole point of the formulation):
    *   - u comes from md5 of the id (first 12 hex = 48 uniform bits,
    *     u = (U+0.5)/2⁴⁸) — content-stable, like [[assignSplit]];
    *   - the E-S rank u^(1/w) is order-isomorphic to ln(u)/w, so the
    *     key is ln(u) in FIXED-POINT micro-nats (one `round(ln·1e6)` —
    *     the t19 trick: a final rounding kills libm ulp differences)
    *     integer-divided by the weight. All ranking comparisons are on
    *     exact integers; no float ever decides an order, and any
    *     warehouse engine replays the sample bit-for-bit.
    *   - ties (identical fixed-point keys) break by id ascending, the
    *     heap's built-in total order.
    *
    * Scale: the bounded heap ([[graft.functions.TopKAgg]]) folds
    * map-side — the exchange carries ≤ partitions·|strata|·k entries,
    * never the corpus. Weights must be POSITIVE integers (basis-point
    * your floats); rows with non-positive weight are excluded.
    *
    * @param weightCol positive integral weight column
    * @return (strataCols..., idCol, sample_rank) — rank 1 = strongest
    *         draw; integral id types only (the long heap carries them)
    */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      strataCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u48 = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    // -ln(u) in micro-nats (positive), then the E-S key ln(u)/w as a
    // NEGATIVE fixed-point long: integer `div` on positive operands is
    // identical in every engine (floor == truncate), where a negative
    // dividend would split engines on floor-vs-truncate semantics
    val keyed = df
      .where(col(weightCol) > 0)
      .withColumn("__neg",
        (-round(log((u48.cast("double") + lit(0.5)) / lit(281474976710656.0))
          * lit(1e6))).cast("long"))
      .withColumn("__key",
        -expr(s"(__neg * 1000000L) div cast($weightCol as bigint)").cast("double"))
    val grouped =
      if (strataCols.isEmpty) keyed.groupBy()
      else keyed.groupBy(strataCols.map(col): _*)
    grouped
      .agg(graft.functions.TopKAgg
        .top_k_by_score(col("__key"), col(idCol).cast("long"), k).as("tk"))
      .select(strataCols.map(col) :+ posexplode(col("tk")): _*)
      .select(strataCols.map(col) ++ Seq(
        col("col.neighbor_id").cast(df.schema(idCol).dataType).as(idCol),
        (col("pos") + 1).as("sample_rank")): _*)
  }

  /** Bloom-filtered decontamination — [[decontaminate]]'s result by a
    * plan that never broadcasts the eval shingle STRINGS. The eval
    * shingles fold into one fixed-size Bloom filter
    * ([[graft.functions.Bloom]]: distributed build, bitwise-OR merge —
    * one numBits/8-byte buffer per partition crosses the exchange), the
    * train side's shingles probe the filter in a codegen pass, and only
    * the surviving candidates — true hits plus
    * the filter's ≈0.8% false positives — reach the exact verify join
    * that removes the false positives. The RESULT is exact and
    * identical to [[decontaminate]]: Bloom filters have no false
    * negatives, so pre-filtering then verifying loses nothing.
    *
    * When it matters: [[decontaminate]] broadcasts the distinct eval
    * shingle set, whose in-memory size grows with eval-suite text
    * volume — fine for one benchmark, not for a consolidated suite of
    * hundreds. The filter is m/8 bytes REGARDLESS of shingle count or
    * length (12 MB default vs GBs of strings), and the verify join is
    * hint-free: its train side is post-filter (≈ true hits + FP rate ×
    * corpus shingles), so AQE sizes a join that is orders of magnitude
    * smaller than the raw shingle join. The eval side is read twice
    * (filter build + verify join) — both linear passes over the small
    * side of the problem.
    *
    * Size `numBits` ≈ 10× the DISTINCT eval shingle count for ≈0.8%
    * false positives at 7 probes; undersizing degrades the pre-filter
    * (more verify work), never correctness.
    *
    * @return (idCol, n_shared_ngrams) — contaminated train docs only
    */
  def decontaminateBloom(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      numBits: Int = 1 << 27,
      numHashes: Int = 7): DataFrame = {
    import graft.functions.Bloom
    val eg = eval
      .select(explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
      .distinct()
    val filt = eg.agg(Bloom.bloom_agg(xxhash64(col("g")), numBits, numHashes).as("bf"))
    val tg = train.select(col(idCol),
      explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
    // The filter reaches the probe as a SCALAR SUBQUERY, not a
    // crossJoin(broadcast(...)): a joined-in row re-reads its BINARY
    // cell per evaluation and UnsafeRow.getBinary COPIES the bytes —
    // at 2³⁰ probed shingles × a 16 MB filter that is petabytes of
    // memcpy charged to the probe loop (95% of d9's CPU at sf0.1
    // before this change; 8× total query CPU). The subquery runs once
    // and inlines as a runtime literal: every row probes the SAME
    // in-place byte array.
    val candidates = tg
      .where(Bloom.bloom_contains(
        org.apache.spark.sql.graft.shims.scalarSubquery(filt),
        xxhash64(col("g"))))
      .select(col(idCol), col("g"))
    // exact verify: drops the Bloom false positives. No broadcast hint —
    // the candidate side is post-filter-tiny and AQE picks the build side
    // from runtime sizes.
    candidates.join(eg, Seq("g"))
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"))
  }

  /** Line-level boilerplate removal (the C4 cleaning pass): keep only
    * lines with at least `minWords` whitespace words and none of the
    * `bannedPhrases` (case-insensitive substring — "click here",
    * "lorem ipsum", cookie banners); documents left with zero lines drop
    * entirely. Word counting is `\S+` runs — the same token contract as
    * every other text op, so a line that counts 3 words here counts 3
    * tokens in [[TextAnalysis]].
    *
    * Everything happens inside one projection over array columns
    * (split → filter → rejoin) — no explode, no shuffle, no per-line
    * rows: the pass is embarrassingly parallel and reads each doc once,
    * which is the only acceptable shape for a rule that runs over every
    * crawl snapshot.
    *
    * @return (idCol, text_clean, n_kept, n_dropped), kept docs only
    */
  def cleanLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 3,
      bannedPhrases: Seq[String] = Seq("click here", "lorem ipsum")): DataFrame = {
    require(bannedPhrases.forall(p => p == p.toLowerCase(java.util.Locale.ROOT)),
      "bannedPhrases must be lowercase (they match against lower(line))")
    val lines = split(col(textCol), "\n")
    val keep = (l: Column) => {
      val enoughWords = size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWords
      bannedPhrases.foldLeft(enoughWords)((acc, p) =>
        acc && !contains(lower(l), lit(p)))
    }
    docs
      .select(col(idCol), lines.as("ls"))
      .select(col(idCol),
        filter(col("ls"), keep).as("kept"),
        size(col("ls")).as("n_lines"))
      .where(size(col("kept")) >= 1)
      .select(col(idCol),
        array_join(col("kept"), "\n").as("text_clean"),
        size(col("kept")).cast("long").as("n_kept"),
        (col("n_lines") - size(col("kept"))).cast("long").as("n_dropped"))
  }

  /** Chunk documents into fixed-length token windows with stride — the
    * max-sequence-length preprocessing step upstream of
    * [[packSequences]]: a document longer than the model context must
    * split into windows (overlapping when `stride < maxTokens`, the
    * standard continuity trick) before packing. Whitespace tokens,
    * lowercased — the same tokenization contract as the text-analysis
    * ops, so chunk token counts agree with [[TextAnalysis]] counts.
    *
    * Scale shape: one narrow tokenize pass, then the per-window explode
    * fans out ×⌈n/stride⌉ — the id repartition BEFORE it spreads that
    * fan-out across the cluster (explode inherits the input's
    * partitioning; a single small file would otherwise chunk the whole
    * corpus on one core). Window starts come from a generated int
    * sequence, the chunk is one `slice` per window — no per-token rows
    * ever exist.
    *
    * @return (idCol, chunk_idx, n_chunk_tokens, chunk_text); empty docs
    *         emit nothing
    */
  def chunkTokenWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      stride: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(stride > 0 && stride <= maxTokens,
      s"stride must be in [1, maxTokens], got $stride (maxTokens=$maxTokens)")
    val par = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    docs
      .repartition(par, col(idCol))
      .select(col(idCol),
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .select(col(idCol), col("toks"),
        explode(expr(s"sequence(0, n - 1, $stride)")).as("start"))
      .select(
        col(idCol),
        expr(s"cast(start div $stride as int)").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(maxTokens)).as("chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    * collapse CLUSTERS of embedding-near-duplicate rows to one
    * representative each — paraphrases and re-renders that string-level
    * dedup can't see. Pairs at `cosine ≥ threshold` form clusters by
    * connected components ([[Dedup.connectedComponents]]: pointer
    * doubling, O(log diameter) rounds); each cluster keeps its smallest
    * id, rows in no pair survive untouched. Transitive by design: A≈B
    * and B≈C collapse to one survivor even when cos(A,C) is below the
    * threshold — the same contract as the text-side cluster dedup.
    *
    * `scalePath = true` mines pairs with sign-LSH
    * ([[Similarity.lshEmbeddingNearDup]], linear, pass `corpusSizeHint`)
    * — the 100 TB path; the default exact all-pairs tier is the oracle
    * anchor. The survivor SET is identical whenever LSH recall holds
    * (miss ≤ 1e-5 at the threshold by [[Similarity.autoBands]]).
    *
    * @return the surviving rows of `embeddings`, original schema
    */
  def semanticDedup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      scalePath: Boolean = false,
      corpusSizeHint: Long = 0): DataFrame = {
    val pairs =
      if (scalePath)
        Similarity.lshEmbeddingNearDup(embeddings, idCol, vecCol, threshold,
          corpusSizeHint = corpusSizeHint)
      else Similarity.embeddingNearDup(embeddings, idCol, vecCol, threshold)
    val dropped = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__drop_id"))
    // anti-join on the id: survivors = everything not a non-representative
    // member; AQE sizes the dropped side (tiny on a clean corpus,
    // corpus-scaled on a duplicate-heavy one — no static hint)
    embeddings.join(dropped, embeddings(idCol) === dropped("__drop_id"), "left_anti")
  }
}

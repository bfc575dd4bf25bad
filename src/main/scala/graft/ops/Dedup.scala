package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (the 100 TB path):
  *   - Exact dedup is one hash aggregation on a 128-bit content hash —
  *     map-side partial combine, single shuffle keyed by the hash (never
  *     by the document text itself).
  *   - MinHash signatures and LSH band keys are computed in a single
  *     narrow pass with higher-order array functions (no UDF, no
  *     explode-before-aggregate blowup: the K hash functions fold over
  *     the shingle array per row). The only shuffle is the band-bucket
  *     grouping, keyed by (band index, 64-bit band hash) — uniformly
  *     distributed by construction, so no skew.
  *   - Candidate pairs are generated inside each LSH bucket and verified
  *     with exact Jaccard via a self-join on doc_id (the candidate set is
  *     tiny relative to the corpus — that's the whole point of LSH).
  *   - SimHash near-dup uses the pigeonhole principle: hamming(a,b) ≤ k
  *     ⇒ at least one of k+1 chunks of the 64-bit signature is equal, so
  *     candidates come from k+1 equi-joins on 16-bit chunks — again
  *     uniform keys, no O(n²) comparison.
  */
object Dedup {

  private val sigSlot = new CacheSlot
  private val pairSlot = new CacheSlot
  private val candSlot = new CacheSlot
  private val shingleSlot = new CacheSlot
  // Exact n-gram-Jaccard pair lists (the embPairSlot recipe on the text
  // side): the matched-pair output is tiny at any dedup threshold, the
  // pass that produces it is the corpus-wide inverted-index/prefix-filter
  // join, and one session runs the IDENTICAL (corpus, threshold, n)
  // computation from several queries — the standalone pair query, the
  // keep-best cluster dedup, and the band sweep's truth set. Capacity 4:
  // full corpus + slice/dense gate variants coexist without evicting the
  // entry the current query family is sharing. The exact-copy COLLAPSE
  // tier's expansion is deliberately NOT slotted — its output is
  // answer-sized (r²/2 per duplicate group), not match-sized; its
  // rep-level recursion lands in this slot via the dispatched tier.
  private val jacPairSlot = new CacheSlot(4)
  // 64-bit signature tables feeding the pigeonhole hamming self-join
  // (simhash, image aHash, audio fingerprint): one (id, sig) row per doc,
  // capacity 4 so the d3/m5/m7 signature families coexist in one session
  private val hammingSigSlot = new CacheSlot(4)

  // ---------------------------------------------------------------- exact

  /** Exact dedup on document content: canonical representative = lowest
    * `idCol` per distinct `textCol` value. Hashes the text to md5 so the
    * shuffle key is fixed-width (never shuffles full documents for
    * comparison; hash collisions for md5 are acceptable at 2^-64 scale,
    * switch to sha2-256 for adversarial corpora).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Repeated-substring span detection — the character-level dedup tier
    * (the distributed re-expression of ExactSubstr, Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better": their
    * single-node suffix array becomes a gram-hash shuffle). A character
    * position is DUPLICATED when some `minLen`-gram covering it occurs
    * at another (doc, pos) — equivalently, when it lies inside some
    * repeated substring of length ≥ minLen. Keep-first semantics: each
    * distinct gram's first occurrence (smallest (doc, pos)) is never
    * flagged, so an isolated repeated passage keeps its first copy.
    * CAVEAT (inherent to span merging, shared with ExactSubstr): when
    * repeats overlap OTHER repeated content, a merged span can extend
    * into a gram's first occurrence — e.g. doc0="GP", doc1="GP",
    * doc2="P" (G, P being ≥L blocks): doc1's span covers its whole
    * text, including the P-prefix grams whose first occurrence at
    * doc0 ended there; excising doc1 and doc2 leaves P intact only
    * inside doc0. Emits maximal merged spans per document.
    *
    * Scale shape: positions explode ONE narrow int-sequence generator
    * (never an array of gram strings — the gram is substring'd and
    * md5-hashed AFTER the explode, so no wide intermediate row exists);
    * the occurrence rank shuffles (gk, doc, pos) rows on the fixed-width
    * md5 key — digest equality IS gram identity (same contract as
    * [[exact]]: a collision between distinct grams would silently rank
    * one as a repeat — accepted, not re-verified, at 2^-64 scale);
    * corpus text never crosses the exchange; span merging is
    * one doc-keyed window + an exchange-free groupBy on the same key.
    * Three exchanges total, all uniform: the narrow pre-fan-out spread
    * (corpus-sized, the only one carrying text), the gram-digest rank,
    * and the doc-keyed island merge. The ×textLen row fan-out is the
    * honest cost of exact substring dedup; cut it with a larger stride
    * only if approximate coverage is acceptable.
    *
    * @return (idCol, span_start, span_end) — 0-based char offsets,
    *         end exclusive; spans of the SECOND-and-later occurrences only
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 50): DataFrame = {
    require(minLen > 0, s"minLen must be positive, got $minLen")
    val id = col(idCol)
    val L = minLen
    // spread docs across the full task count BEFORE the ×textLen gram
    // fan-out: the explode and the per-gram substr+md5 run at the INPUT's
    // partitioning (a single small file = a single task doing all the
    // hashing), and the fan-out multiplies whatever imbalance exists
    val par = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // ONE kernel pass per doc ([[graft.functions.CharGrams]]): builds
    // the char→byte offset table once and digests every L-gram from it.
    // The expression-chain formulation (explode positions + substr +
    // md5) is QUADRATIC in doc length — Substring walks bytes from the
    // start per call — and measured 4× this kernel's CPU at sf0.1.
    // posexplode's index IS the gram position; the 16-byte binary
    // digest is the shuffle key (never the gram text).
    // "every occurrence but the gram's first" via an UNBOUNDED-frame
    // min(struct) window rather than row_number: (id, pos) is unique per
    // occurrence, so `!= group-min` selects exactly the rn>1 rows, but
    // the window needs no per-group ORDER BY (the exchange sorts on gk
    // alone) and no rank counter — measured 18.5 → 13.2 executor-CPU-s
    // warm on the sf0.1 stage with byte-identical output (the A/B/C
    // sweep also tried aggregate+self-join: same CPU, one extra
    // exchange, 2× wall — rejected)
    val dupPos = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= L)
      .repartition(par, id)
      .select(id,
        posexplode(graft.functions.CharGrams.char_gram_digests(col(textCol), L))
          .as(Seq("pos", "gk")))
      .select(id, col("pos").cast("long").as("pos"), col("gk"))
      .withColumn("first", min(struct(id, col("pos"))).over(
        Window.partitionBy(col("gk"))))
      .where(struct(id, col("pos")) =!= col("first"))
      .select(id, col("pos"))
    // island merge: a new span starts when this gram's window no longer
    // touches the previous one (pos > prev + L); islands then group to
    // (min, max+L). The groupBy key includes the window's partition key,
    // so it reuses the window exchange.
    val byDoc = Window.partitionBy(id).orderBy(col("pos").asc)
    dupPos
      .withColumn("brk",
        when(lag(col("pos"), 1).over(byDoc).isNull
          || col("pos") > lag(col("pos"), 1).over(byDoc) + L, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(id, col("island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + L).as("span_end"))
      .drop("island")
  }

  /** Cut the [[repeatedSpans]] out of each document: the surviving text
    * is the concatenation of the uncovered gaps (Lee et al.'s excision
    * policy). Keep-first means an isolated repeated passage keeps its
    * first copy; see [[repeatedSpans]]' caveat — where repeats overlap
    * other repeated content, the merged span can cut into a first
    * occurrence. Documents with no repeated span pass through unchanged.
    */
  def cutRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 50): DataFrame = {
    val id = col(idCol)
    val spans = repeatedSpans(docs, idCol, textCol, minLen)
      .groupBy(id)
      .agg(array_sort(collect_list(struct(col("span_start"), col("span_end")))).as("spans"))
    val txt = col(textCol)
    // fold the sorted spans: emit each gap [cur, start), advance cur to
    // the span's end; finish with the tail gap. One narrow pass — the
    // span list per doc is tiny next to the text.
    val cut = aggregate(
      col("spans"),
      struct(lit("").as("done"), lit(0L).as("cur")),
      (acc, s) => struct(
        concat(acc("done"), txt.substr(acc("cur") + 1, s("span_start") - acc("cur"))).as("done"),
        s("span_end").as("cur")),
      acc => concat(acc("done"), txt.substr(acc("cur") + 1, length(txt).cast("long") - acc("cur"))))
    docs
      .join(spans, Seq(idCol), "left")
      .select(id, when(col("spans").isNull, txt).otherwise(cut).as(textCol))
  }

  // ------------------------------------------------------------- shingles

  /** Distinct word `n`-gram shingles of lowercased text, as an array.
    * Tokenization = non-space runs (`\S+`), matching
    * [[graft.functions.NGramShingles]] and the DuckDB oracle exactly.
    */
  def shingles(text: Column, n: Int): Column = {
    val words = regexp_extract_all(lower(text), lit("\\S+"), lit(0))
    // size-n+1 shingles at 0-based offsets 0..size-n (guarded by the
    // size>=n branch below, so the sequence bounds are always valid).
    val grams = transform(
      sequence(lit(0), size(words) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)
    )
    // Short texts (< n words) get a single whole-text shingle so they can
    // still match exact copies of themselves.
    array_distinct(when(size(words) >= n, grams).otherwise(array(concat_ws(" ", words))))
  }

  // -------------------------------------------------------- MinHash + LSH
  // (The signature/band kernels live in graft.functions.MinHash as a
  // native codegen expression — higher-order-function formulations were
  // removed: interpreted lambdas are ~100x slower, get pushed below
  // exchanges, and used different per-permutation seeding, so they were
  // NOT drop-in equivalent to the kernel.)

  /** The per-document MinHash state: (doc_id, sh, sig) — distinct word
    * n-gram shingles plus the K-value minhash signature, computed in ONE
    * narrow codegen pass over the corpus. This is the build artifact of
    * the LSH pipeline: at cluster scale you compute it once and persist
    * it (or write it out bucketed by doc_id) so that banding, candidate
    * pruning, and exact verification all read the same materialization
    * instead of re-running the kernel per consumer.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      k: Int = 128): DataFrame = {
    // Repartition first: the hash kernel is CPU-bound and the source is
    // often few parquet row-groups; spread it across all cores.
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.where(col(textCol).isNotNull).repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.functions.NGramShingles.ngram_shingles(col(textCol), n).as("sh"))
      .withColumn("sig", graft.functions.MinHash.minhash_sig(col("sh"), k))
  }

  /** Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.
    *
    * @param df        documents
    * @param idCol     unique id column (orderable)
    * @param textCol   text column
    * @param threshold exact-Jaccard acceptance threshold on word-`n`-gram
    *                  shingle sets
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    *
    * With k=128, bands=32, rows=4 the candidate-recall at j=0.8 is
    * 1-(1-0.8⁴)³² ≈ 1-5e-8 — misses are negligible; false positives are
    * removed by the exact verification join.
    *
    * Cost shape (the 100 TB path): one kernel pass builds
    * [[minhashSignatures]] (persisted for the query's lifetime); the only
    * corpus-wide shuffle is the band-bucket join on uniform 64-bit keys;
    * candidate docs are pruned out of the signature table with a
    * semi-join (AQE broadcasts it when it fits; no static hint, so a
    * duplicate-heavy corpus can't OOM the driver); and a
    * signature-estimated-Jaccard pre-filter
    * (margin 6σ below the threshold, so a true pair at j=threshold is
    * rejected with p≈1e-9) refutes most false-positive bucket collisions
    * BEFORE any shingle array is compared — `array_intersect` runs only
    * on pairs whose signatures already look like duplicates.
    */
  def minhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      n: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      collapseDups: Boolean = true,
      collapseRatio: Double = 0.7): DataFrame = {
    require(k % bands == 0, "bands must divide k")

    // EXACT-COPY COLLAPSE dispatch (the ngramJaccardPairsAuto rationale,
    // applied before the signature kernel): on a replica-heavy crawl the
    // shingling+hashing pass and the band shuffle pay per COPY while the
    // answer is determined per distinct TEXT — exact copies share a
    // signature, land in every common bucket, and pair at j = 1 always
    // (identical shingle sets), so running LSH on distinct-text
    // representatives and expanding through the group keys is the same
    // pair set. NOTE dupDensity is an eager one-scan action at CALL time
    // (see its doc); duplicate-light callers pass collapseDups=false.
    if (collapseDups) {
      val (nDocs, nDistinct) = dupDensity(df, textCol)
      if (nDocs > 0 && nDistinct < collapseRatio * nDocs) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"minhashNearDup: $nDistinct distinct texts over $nDocs docs " +
            s"(< $collapseRatio) -> exact-copy collapse tier")
        val out = collapseExpandPairs(df, idCol, textCol) { reps =>
          minhashNearDup(reps, "doc_id", "text", threshold, n, k, bands,
            collapseDups = false)
        }
        // AFTER the rep-level recursion (which records its own tier)
        lastTier.put("minhashNearDup", "collapse")
        return out
      }
    }
    lastTier.put("minhashNearDup", "direct")

    // bounded cache: a new call releases the previous call's signature
    // table (corpus-sized), so repeated invocations don't accumulate
    val sigs = sigSlot.persist(minhashSignatures(df, idCol, textCol, n, k))

    // posexplode_outer, NOT posexplode: the non-outer Generate adds an
    // implicit `size(bands)>0` filter that predicate pushdown moves below
    // the repartition exchange, re-evaluating the banding on the serial
    // pre-shuffle side. Band arrays are never empty for non-null text,
    // so outer semantics are identical here.
    val banded = sigs.select(col("doc_id"),
      posexplode_outer(graft.functions.MinHash.bands_from_sig(col("sig"), bands))
        .as(Seq("band_idx", "band_key")))

    // The candidate table is consumed THREE times in the pairs plan
    // below (the pair join itself, plus twice through `needed`'s
    // semi-join pruning) and Spark does not share common subplans within
    // one action — unpersisted, the bucket self-join + distinct (the
    // single most expensive stage of this pipeline) runs three times.
    // Bounded slot, same discipline as the signature table: LSH keeps
    // candidate volume near-linear in the corpus, and MEMORY_AND_DISK
    // spills rather than OOMs on a duplicate-heavy crawl.
    val cand = candSlot.persist(bucketCandidates(banded, Seq("band_idx", "band_key")))

    // Prune the signature table down to docs that appear in some
    // candidate pair so the pair joins below never shuffle full-corpus
    // shingle arrays. NO broadcast hint: candidate ids are a vanishing
    // fraction of a clean corpus but corpus-sized on a duplicate-heavy
    // crawl (the realistic worst case for dedup), and a forced broadcast
    // then OOMs the driver. AQE still picks broadcast when it fits —
    // same reasoning as ngramJaccardPairs below.
    val candIds = cand
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct()
    val needed = sigs.join(candIds, Seq("doc_id"), "left_semi")

    // 6σ below threshold: a TRUE pair sitting exactly at j=threshold is
    // pre-filtered away with p≈1e-9 (vs ≈3e-5 at 4σ) — the wider margin
    // costs almost nothing because exact verification follows, and it
    // keeps the "LSH output == exact pairs" contract (asserted by the
    // d2/t6/t9/t11 oracles) safe even for corpora with MANY pairs near
    // the threshold. NOTE: that contract is still probabilistic
    // (banding miss ≈ 5e-8 per pair at j=0.8); it is verified
    // exhaustively at sf0.01/sf0.1 — re-verify when changing k/bands.
    val margin = 6.0 * math.sqrt(threshold * (1.0 - threshold) / k)
    val pairs = cand
      .join(needed.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(needed.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("id_b"))
      // cheap signature pre-filter first (left-to-right short-circuit),
      // exact Jaccard only for pairs that survive it
      .where(graft.functions.MinHash.sig_overlap(col("sig_a"), col("sig_b")) >= threshold - margin)
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    // The verified pair table is a few rows per duplicate cluster —
    // nothing next to the corpus — while producing it costs the banding
    // shuffle + candidate joins. Sessions fan it out to several consumers
    // (pair listing, clustering, curation, decontamination pipelines), so
    // park it in a bounded slot like the signature table: equal plans
    // share one cached copy, a different corpus evicts it.
    pairSlot.persist(pairs)
  }

  /** MinHash banding capacity sweep — the "how many bands do I buy"
    * report a dedup deployment makes before committing an LSH budget
    * over 100 TB (v24's nProbe sweep applied to the near-dup tier):
    * candidate volume and recall against the EXACT-Jaccard truth set,
    * per band tier, from ONE shared signature pass.
    *
    * Every tier is the REAL configuration a b-band deployment would
    * run: tier b hashes b bands of k/b signature rows (not b prefix
    * bands of the largest tier's k/maxBands rows — prefix tiers report
    * the candidate volume of a banding nobody deploys, which defeats a
    * capacity report). The gates stay executable THEOREMS (the v24
    * stance) because the tiers form a DIVISIBILITY CHAIN and
    * `foldBands` chunks contiguously: a tier-b band is a union of
    * whole tier-(m·b) bands, so agreeing on the whole block implies
    * agreeing on every sub-block — candidate sets are nested, recall
    * is provably monotone, and an exact duplicate (j = 1, identical
    * signature) is found by EVERY tier. Mid-threshold recall values
    * depend on the hash draw and are deliberately engine-internal
    * (the x17/e46 stance: only order-immune guarantees cross to an
    * oracle).
    *
    * Cost shape: one signature pass feeds all tiers (Σ tiers band keys
    * per doc — ~2× the largest tier for a doubling chain), then ONE
    * bucket self-join keyed on (tier, band) and a pair-grain
    * `min(tier)` aggregate; every tier's counts fall out of ONE
    * conditional aggregation over the (pair, first_tier) relation
    * full-outer-joined with the truth set.
    *
    * @param bandTiers strictly increasing divisibility chain (each
    *                  tier divides the next — the nesting theorem's
    *                  hypothesis); every tier must divide k; the LAST
    *                  tier, per the d2 contract, must recover the full
    *                  truth set
    * @return one row per tier: (bands, n_candidates, n_truth, n_hit,
    *         recall_bp — NULL when the truth set is empty)
    */
  def minhashBandSweep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      n: Int = 3,
      k: Int = 128,
      bandTiers: Seq[Int] = Seq(4, 8, 16, 32)): DataFrame = {
    require(bandTiers.nonEmpty && bandTiers == bandTiers.sorted &&
      bandTiers.distinct == bandTiers && bandTiers.head >= 1,
      s"bandTiers must be strictly increasing and positive: $bandTiers")
    require(bandTiers.sliding(2).forall(p => p.length < 2 || p(1) % p(0) == 0),
      s"bandTiers must form a divisibility chain (each divides the next) — " +
        s"that is what makes nesting/monotonicity theorems, not luck: $bandTiers")
    bandTiers.foreach(b =>
      require(k % b == 0, s"every tier must divide k=$k (tier $b is not a " +
        "real b-band configuration otherwise)"))
    val sigs = sigSlot.persist(minhashSignatures(df, idCol, textCol, n, k))
    val banded = bandTiers.map { b =>
      sigs.select(col("doc_id"), lit(b).as("tier"),
        posexplode_outer(graft.functions.MinHash.bands_from_sig(col("sig"), b))
          .as(Seq("band_idx", "band_key")))
    }.reduce(_ unionAll _)
    val firstTier = banded
      .select(col("doc_id").as("id_a"), col("tier"), col("band_idx"), col("band_key"))
      .join(banded.select(col("doc_id").as("id_b"), col("tier"), col("band_idx"),
          col("band_key")),
        Seq("tier", "band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(min(col("tier")).as("ft"))
    val truth = ngramJaccardPairsAuto(df, idCol, textCol, threshold, n)
      .select(col("id_a"), col("id_b"), lit(1L).as("is_true"))
    val j = firstTier.join(truth, Seq("id_a", "id_b"), "full_outer")
      .select(col("ft"), coalesce(col("is_true"), lit(0L)).as("is_true"))
    // coalesce: a corpus with NO candidate pairs and NO truth pairs (a
    // small clean slice) must report zeros, not a row of NULL gates
    val aggs = bandTiers.flatMap { b =>
      Seq(
        coalesce(sum(when(col("ft") <= b, 1L).otherwise(0L)), lit(0L)).as(s"nc_$b"),
        coalesce(sum(when(col("ft") <= b && col("is_true") === 1L, 1L).otherwise(0L)),
          lit(0L)).as(s"nh_$b"))
    } :+ coalesce(sum(col("is_true")), lit(0L)).as("n_truth")
    val one = j.agg(aggs.head, aggs.tail: _*)
    one.select(col("n_truth"), expr(
        s"stack(${bandTiers.size}, " +
          bandTiers.map(b => s"$b, nc_$b, nh_$b").mkString(", ") +
          ") AS (bands, n_candidates, n_hit)"))
      .withColumn("recall_bp",
        when(col("n_truth") > 0, expr("(10000 * n_hit) div n_truth")))
      .select("bands", "n_candidates", "n_truth", "n_hit", "recall_bp")
  }

  /** Distinct candidate (id_a, id_b) pairs (id_a < id_b) from bucket
    * membership: rows sharing a bucket key pair up. Self-join
    * formulation, shared by MinHash and sign-LSH: no per-bucket array is
    * ever materialized, so a degenerate bucket (a whole corpus of one
    * duplicate text) streams through a join and spills instead of
    * building one giant collect_list in a single task.
    */
  private[ops] def bucketCandidates(banded: DataFrame, keyCols: Seq[String]): DataFrame = {
    val x = banded.toDF(banded.columns.map(c => if (c == "doc_id") "id_a" else c): _*)
    val y = banded.toDF(banded.columns.map(c => if (c == "doc_id") "id_b" else c): _*)
    x.join(y, keyCols)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  // ------------------------------------------------- exact n-gram Jaccard

  /** Exact all-pairs n-gram Jaccard ≥ threshold, computed the scalable way:
    * explode shingles, equi-join on the shingle (inverted index), count
    * intersections per pair, then Jaccard by inclusion–exclusion. Never
    * materializes the O(n²) pair space — only pairs sharing ≥1 shingle.
    * Quadratic in the HEAD: a shingle appearing in k documents self-joins
    * into k² candidate rows, so a corpus-wide boilerplate phrase (license
    * banner, nav chrome) dominates everything. Kept as the
    * oracle-friendly reference; [[ngramJaccardPairsPrefix]] below is the
    * default exact tier (measured on a 20k-doc corpus with one shared
    * 8-word header: 53 s/1317 CPU-s naive vs 3.8 s/43 CPU-s prefix —
    * and the gap is quadratic in corpus size).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The shingle table fans out to FOUR consumers (both inverted-index
    // join sides and both size lookups); the two `sizes` branches join on
    // different keys, so exchange reuse cannot dedupe them and each
    // re-runs the shingle kernel over the corpus. One bounded cached
    // copy = one kernel pass.
    val sh = shingleSlot.persist(df.repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.functions.NGramShingles.ngram_shingles(col(textCol), n).as("sh")))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inter = inv.as("x")
      .join(inv.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    // no broadcast() hint: `sizes` is corpus-sized (one row per doc) and
    // force-broadcasting it OOMs the driver at scale; AQE still picks a
    // broadcast when it actually fits
    jacPairSlot.persist(inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard")))
  }

  /** Exact all-pairs n-gram Jaccard with PREFIX FILTERING (Chaudhuri et
    * al. 2006 "A Primitive Operator for Similarity Joins"; Bayardo et
    * al. 2007 "Scaling Up All Pairs Similarity Search") — same result set
    * as [[ngramJaccardPairs]], but the inverted index only posts each
    * document's PREFIX under a global token order, which is what makes
    * the exact tier itself survive corpus scale instead of deferring to
    * LSH.
    *
    * The guarantee: order all shingles by ascending global document
    * frequency (rarest first; ties by token value — any total order
    * works, frequency order minimizes candidates). If J(x,y) ≥ t, then
    * |x∩y| ≥ t·max(|x|,|y|), so x and y must share a token within the
    * first `|d| − ⌈t·|d|⌉ + 1` tokens of each ordering — a document's
    * prefix. Indexing only prefixes shrinks every posting list, and
    * frequency order evicts exactly the HEAD tokens (stopword shingles)
    * whose quadratic posting-list self-joins dominate the naive index.
    * A length filter (`t·|x| ≤ |y| ≤ |x|/t`, from J ≤ min/max) prunes
    * inside the candidate join itself.
    *
    * Threshold arithmetic is integer basis points with `tBp =
    * ⌊t·10⁴⌋` — rounding DOWN, so the prefix/length filters run at a
    * threshold ≤ t (longer prefixes, never a missed pair); the exact
    * verification step applies the caller's full-precision `t`. A
    * double `ceil(0.8·n)` would be off-by-one whenever 0.8·n lands an
    * ulp above an integer, and here off-by-one means a silently MISSING
    * pair.
    *
    * Candidates are verified with one `array_intersect` over the two
    * cached shingle arrays (shuffle keyed by doc id, which the shingle
    * table is already partitioned on) — the candidate set after
    * prefix+length filtering is small, so per-pair set intersection
    * beats re-aggregating the full inverted index.
    *
    * Scale shape: global frequencies are one token-keyed groupBy; the
    * rank attach reuses that same token partitioning; the per-doc sort
    * is a doc-keyed groupBy over (token, freq) pairs; the candidate
    * self-join shuffles only prefix postings. Nothing driver-side, no
    * broadcast hints.
    *
    * Measured trade (tools.ProfileD4, after moving everything but the
    * verify onto 64-bit token hashes): on a benign near-uniform corpus
    * (sf0.1 documents) the prefix machinery is within ~25% of the naive
    * index warm (9.0 vs 7.2 CPU-s); on a 20k-doc corpus sharing one
    * 8-word boilerplate header the naive index is 58 s/1400 CPU-s vs
    * 4 s/36 CPU-s here — a gap that grows quadratically with corpus
    * size. Real web corpora are the second case, so this is the default.
    */
  def ngramJaccardPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val tBp = math.floor(threshold * 10000).toLong
    val sh = shingleSlot.persist(df.repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.functions.NGramShingles.ngram_shingles(col(textCol), n).as("sh")))
    // Everything except the final verification runs on 64-BIT TOKEN
    // HASHES, not the shingle strings: the frequency groupBy, the
    // rank-attach join, the per-doc struct sort, and the candidate
    // equi-join all shuffle/compare fixed-width longs instead of ~20-char
    // strings (measured 2.5× CPU on the sf0.1 corpus). Correctness: any
    // total order over token identities serves the prefix theorem, and a
    // shared token always maps to a shared hash; an xxhash64 collision
    // can only merge two tokens' frequency counts or over-generate a
    // candidate — both absorbed by the exact verify step (the same
    // 64-bit-identity stance as the md5 dedup keys, documented there).
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("s"))
    // Global document frequency per shingle hash, joined back on the
    // SAME key the groupBy just partitioned on (exchange reused); then
    // one doc-keyed groupBy rebuilds each document's hash list sorted by
    // (freq asc, hash asc) — structs sort lexicographically by field.
    val freq = inv.groupBy("s").agg(count(lit(1)).as("tok_df"))
    val ordered = inv.join(freq, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("tok_df"), col("s")))).as("ord"))
      // prefix length |d| − ⌈t'·|d|⌉ + 1 via integer ceil-division
      .select(col("doc_id"), size(col("ord")).as("n_sh"),
        expr(s"transform(slice(ord, 1, " +
          s"size(ord) - (($tBp * size(ord) + 9999) div 10000) + 1), p -> p.s)")
          .as("pref"))
    val post = ordered.select(col("doc_id"), col("n_sh"), explode(col("pref")).as("s"))
    val cand = post.as("x")
      .join(post.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
          // length filter: 10⁴·|y| ≥ t'·10⁴·|x| both ways (J ≤ min/max)
          col("y.n_sh") * 10000L >= col("x.n_sh") * tBp &&
          col("x.n_sh") * 10000L >= col("y.n_sh") * tBp)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    // Exact verification: one set intersection per surviving candidate.
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    jacPairSlot.persist(cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("inter"),
        size(col("sh_a")).as("n_a"), size(col("sh_b")).as("n_b"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard")))
  }

  /** Exact all-pairs n-gram Jaccard with ADAPTIVE tier selection — same
    * result set as both tiers above, picking between them from the
    * corpus's measured shingle-frequency skew instead of statically.
    *
    * The trade being arbitrated (measured in `tools.ProfileD4`): the
    * prefix filter wins quadratically on skewed corpora (a shared
    * boilerplate shingle posts in k docs → k² naive candidate rows) but
    * its frequency/rank/sort machinery costs ~2× over the naive inverted
    * index on benign near-uniform corpora. The decision statistic is
    * exactly the naive tier's candidate-row volume: `cand =
    * Σ_s df(s)·(df(s)−1)/2` over the shingle document frequencies,
    * versus the corpus's posting count `P = Σ_s df(s)` (≈ the linear
    * work both tiers pay anyway). `cand ≤ candPerPosting·P` → the
    * posting lists are short and near-uniform, naive's single self-join
    * is the cheaper plan; above it the quadratic head dominates and the
    * prefix tier pays for itself. The default cutoff is the log-midpoint
    * of the measured regimes: benign sf0.1 corpus ratio ≈ 4.9 → naive
    * (warm 1.3 s vs prefix 2.9 s); the same corpus replicated 10×
    * (every doc 10 exact copies — the crawl-dedup regime) ratio ≈ 49 →
    * prefix; a 20k-doc corpus sharing an 8-word header ratio ≈ thousands
    * → prefix (5.6 s vs naive 64 s). Near the cutoff the tiers are
    * within ~2× of each other, so misrouting there is benign by
    * construction.
    *
    * Cost of deciding: the duplicate-density probe is an EAGER action —
    * one full text scan at CALL time, before the returned DataFrame is
    * ever evaluated (skip it with collapseDups=false when the corpus is
    * known duplicate-light) — plus ONE extra scalar aggregation over the
    * shingle-hash frequency table (a map-side-combining groupBy on
    * fixed-width longs — the same first pass the prefix tier runs
    * anyway) and one driver scalar. The shingle table itself is persisted through the shared
    * slot before deciding, so the dispatched tier's identical plan is a
    * cache HIT, not a recompute; `df` is double-counted by Spark's
    * cost model, never by execution. df products are summed as doubles —
    * this is a cost estimate, and `df(s)²` for a web-scale shared
    * shingle can exceed Long.
    */
  def ngramJaccardPairsAuto(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      candPerPosting: Double = 16.0,
      collapseDups: Boolean = true,
      collapseRatio: Double = 0.7): DataFrame = {
    // EXACT-COPY COLLAPSE tier (the web-crawl regime: the 100× replica
    // corpus holds 99 exact copies of every doc, and the exact-Jaccard
    // shuffle then carries shingle arrays for r(r−1)/2 pairs PER GROUP —
    // measured as a >74 GB shuffle-spill ENOSPC at 100×). Jaccard is a
    // function of the TEXTS, so the pair table over distinct texts plus
    // an output-sized expansion is the same answer: pairs among copies
    // are exactly j = 1, cross-group pairs inherit their
    // representatives' j. One count/count-distinct scan decides (an
    // EAGER action at call time — see dupDensity's doc; duplicate-light
    // callers skip it with collapseDups=false); the quadratic tiers then
    // run on the distinct-text relation only.
    if (collapseDups) {
      val (nDocs, nDistinct) = dupDensity(df, textCol)
      if (nDocs > 0 && nDistinct < collapseRatio * nDocs) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"ngramJaccardPairsAuto: $nDistinct distinct texts over $nDocs docs " +
            s"(< $collapseRatio) -> exact-copy collapse tier")
        val out = ngramJaccardPairsCollapsed(df, idCol, textCol, threshold, n, candPerPosting)
        // AFTER the rep-level recursion (which records its own tier)
        lastTier.put("ngramJaccard", "collapse")
        return out
      }
    }
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sh = shingleSlot.persist(df.repartition(par, col(idCol))
      .select(col(idCol).as("doc_id"),
        graft.functions.NGramShingles.ngram_shingles(col(textCol), n).as("sh")))
    val stats = sh.select(explode(col("sh")).as("tok"))
      .select(xxhash64(col("tok")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("tok_df"))
      .agg(
        coalesce(sum(col("tok_df")), lit(0L)).as("postings"),
        coalesce(sum(col("tok_df").cast("double") *
          (col("tok_df") - lit(1)).cast("double") / 2), lit(0.0)).as("cand"))
      .head()
    val postings = stats.getLong(0)
    val cand = stats.getDouble(1)
    val usePrefix = cand > candPerPosting * postings.toDouble
    org.slf4j.LoggerFactory.getLogger(getClass).info(
      s"ngramJaccardPairsAuto: postings=$postings candidateRows=$cand " +
        s"ratio=${if (postings == 0) 0.0 else cand / postings} cutoff=$candPerPosting " +
        s"-> ${if (usePrefix) "prefix-filter" else "naive inverted-index"} tier")
    lastTier.put("ngramJaccard", if (usePrefix) "prefix" else "naive")
    if (usePrefix) ngramJaccardPairsPrefix(df, idCol, textCol, threshold, n)
    else ngramJaccardPairs(df, idCol, textCol, threshold, n)
  }

  private val collapseSlot = new CacheSlot

  /** Which tier each *Auto dispatch last chose ("ngramJaccard" →
    * collapse/prefix/naive, "minhashNearDup" → collapse/direct). A
    * testability hook ONLY — the d4c/d2c gate specs assert the collapse
    * path provably ran; never read it for control flow.
    */
  private[graft] val lastTier =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Duplicate-density probe shared by the collapse-dispatching pair
    * operators: (non-null-text docs, distinct texts). NOTE this is an
    * EAGER action at plan-construction time — one full text scan (a
    * map-side-combining count-distinct over xxhash64) runs when the
    * operator is CALLED, even if the returned DataFrame is never
    * evaluated. Callers that know their corpus is duplicate-light skip
    * it with collapseDups=false. xxhash64 is safe HERE because a
    * collision only nudges a cost estimate toward collapsing — and the
    * collapse tier is exact on ANY corpus — while the tier's group
    * identity below must not collide and uses SHA-256.
    */
  private def dupDensity(df: DataFrame, textCol: String): (Long, Long) = {
    val r = df
      .agg(count(when(col(textCol).isNotNull, 1)).as("n"),
        count_distinct(when(col(textCol).isNotNull, xxhash64(col(textCol)))).as("d"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Shared exact-copy collapse machinery: group docs by text identity,
    * run the expensive pair machinery (`repPairs`) on one REPRESENTATIVE
    * per distinct text, then expand — within-group pairs are j = 1 by
    * identity, cross-group pairs join members through the two group keys
    * (equi-joins sized by the OUTPUT, never a shuffle of shingle arrays
    * or signatures per pair). NULL texts are excluded up front exactly
    * as the direct tiers exclude them (no shingles → no postings, no
    * signature → no bands).
    *
    * Group identity is SHA-256 of the text, NOT a 64/128-bit hash: this
    * is a web-crawl dedup path where adversarial documents are the
    * stated regime, and a collision here silently merges distinct texts
    * into one group, fabricating j = 1 pairs (md5 chosen-prefix
    * collisions are practical). One SHA pass per doc is noise next to
    * the shingling it replaces.
    *
    * `repPairs` receives (doc_id, text) — one row per distinct text,
    * doc_id = the smallest member id — and must return
    * (id_a, id_b, jaccard) with id_a < id_b over those rep ids.
    */
  /** The collapse tiers' shared grouping: (keyed = (doc_id, text, h)
    * with NULL texts dropped, reps = one (h, rep_id, text) row per
    * distinct text, rep_id = the smallest member id). `keyed` goes
    * through the bounded slot — both downstream shapes (pair expansion,
    * cluster expansion) consume it several times. first(text) is
    * deterministic because every text in a group is IDENTICAL
    * (SHA-256 group identity — a weaker key would break this silently).
    */
  private def collapseKeyed(
      df: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val keyed = collapseSlot.persist(
      df.where(col(textCol).isNotNull)
        .select(col(idCol).as("doc_id"), col(textCol).as("text"),
          sha2(col(textCol), 256).as("h")))
    val reps = keyed.groupBy("h")
      .agg(min(col("doc_id")).as("rep_id"), first(col("text")).as("text"))
    (keyed, reps)
  }

  private def collapseExpandPairs(
      df: DataFrame,
      idCol: String,
      textCol: String)(repPairs: DataFrame => DataFrame): DataFrame = {
    val (keyed, reps) = collapseKeyed(df, idCol, textCol)
    val rp = repPairs(reps.select(col("rep_id").as("doc_id"), col("text")))
    val mem = keyed.select(col("h"), col("doc_id"))
    val ra = reps.select(col("rep_id").as("id_a"), col("h").as("ha"))
    val rb = reps.select(col("rep_id").as("id_b"), col("h").as("hb"))
    val cross = rp
      .join(ra, Seq("id_a")).join(rb, Seq("id_b"))
      .join(mem.select(col("h").as("ha"), col("doc_id").as("ma")), Seq("ha"))
      .join(mem.select(col("h").as("hb"), col("doc_id").as("mb")), Seq("hb"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))
    val within = mem.select(col("h"), col("doc_id").as("id_a"))
      .join(mem.select(col("h"), col("doc_id").as("id_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
    cross.union(within)
  }

  /** The n-gram collapse tier's body: [[collapseExpandPairs]] recursing
    * into the auto dispatch with collapse off for the rep-level pairs.
    */
  private def ngramJaccardPairsCollapsed(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int,
      candPerPosting: Double): DataFrame =
    collapseExpandPairs(df, idCol, textCol) { reps =>
      ngramJaccardPairsAuto(reps, "doc_id", "text", threshold, n,
        candPerPosting, collapseDups = false)
    }

  // ------------------------------------------------ duplicate clustering

  /** Connected components over near-duplicate pairs: every doc that
    * appears in some pair gets a `cluster_id` = the smallest doc id
    * reachable through pair edges. This is the principled cluster-level
    * dedup (keep one representative per CLUSTER) on top of any pair
    * source ([[minhashNearDup]], [[simhashNearDup]],
    * [[graft.ops.Similarity.lshEmbeddingNearDup]]).
    *
    * Algorithm: min-label propagation accelerated with POINTER DOUBLING
    * (label ← label-of-label each round, the Shiloach–Vishkin/hash-to-min
    * shortcut): one neighbor-min join+agg extends reach by a hop, then
    * composing the label map with itself folds chains in half, so reach
    * grows GEOMETRICALLY — O(log diameter) rounds instead of O(diameter).
    * Each round is two shuffle-joins + one partial-combine agg on doc id,
    * state persisted and the previous round released. The driver-side
    * loop holds only a changed-row COUNT per round — no row data. Throws
    * if `maxIter` rounds don't converge — wrong cluster ids must never be
    * returned silently.
    *
    * The CONVERGED label table is memoized per pair-plan (canonicalized
    * plan equality, same mechanism as the shared signature table): every
    * consumer of the same pair source (cluster listing, clustered
    * curation, the capstone pipeline) pays for one convergence, not one
    * each. The memo is a small LRU ([[labelMemoMax]] entries), so a
    * workload alternating between a few corpora (pipeline A, pipeline B,
    * back to A) keeps every one a memo hit instead of thrashing a single
    * slot.
    *
    * Checkpoint-file hygiene: an EVICTED entry's reliable-checkpoint
    * files are reclaimed by the ContextCleaner only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`
    * ([[graft.EngineSession]] sets it; the Spark default is FALSE). A
    * caller constructing its own SparkSession with a checkpoint dir
    * should set it too, or evicted label checkpoints accumulate on disk
    * for the application lifetime.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    cachedLabels(pairs, maxIter) match {
      case Some(hit) => return hit
      case None => ()
    }
    // One convergence at a time: concurrent callers with the SAME pair
    // plan (Verify submits queries from a thread pool) would otherwise
    // each converge — tripling the work. Serializing turns the followers
    // into memo hits. A caller with a DIFFERENT pair plan also waits
    // here: the deliberate trade is bounded memory — a few cached label
    // tables, one convergence in flight — for cross-plan concurrency
    // this workload doesn't have.
    ccLock.synchronized {
      cachedLabels(pairs, maxIter) match {
        case Some(hit) => hit
        case None => converge(pairs, maxIter)
      }
    }
  }

  /** Near-duplicate clusters end-to-end — [[minhashNearDup]] →
    * [[connectedComponents]] — with the exact-copy collapse dispatch
    * FUSED across both stages. The fusion matters because the cluster
    * answer is PER-DOC (linear), unlike the pair answer (quadratic in
    * replica count): collapsing only inside minhashNearDup would expand
    * r(r−1)/2 identity pairs per replica group just for the CC stage to
    * contract them again, so at 100× replicas CC grinds a 27M-edge graph
    * whose every clique contracts to one node. Fused, CC runs on the
    * REP-level pair graph (one node per distinct text) and members
    * inherit their group's label in one output-sized join.
    *
    * Label correctness: cluster_id = the smallest reachable DOC id. A
    * group's rep is its smallest member, so the smallest doc in an
    * expanded cluster IS the smallest rep in the rep-level cluster —
    * members inherit the rep-level label unchanged. A group with ≥ 2
    * members but no cross-group pair is its own cluster (its copies
    * pair with each other at j = 1); a singleton group with no cross
    * pair appears in no pair at all and is excluded, exactly as the
    * direct path excludes it.
    */
  def nearDupClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      n: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      collapseDups: Boolean = true,
      collapseRatio: Double = 0.7,
      maxIter: Int = 25): DataFrame = {
    if (collapseDups) {
      val (nDocs, nDistinct) = dupDensity(df, textCol)
      if (nDocs > 0 && nDistinct < collapseRatio * nDocs) {
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"nearDupClusters: $nDistinct distinct texts over $nDocs docs " +
            s"(< $collapseRatio) -> fused exact-copy collapse tier")
        val (keyed, reps) = collapseKeyed(df, idCol, textCol)
        val repPairs = minhashNearDup(
          reps.select(col("rep_id").as("doc_id"), col("text")),
          "doc_id", "text", threshold, n, k, bands, collapseDups = false)
        val repCC = connectedComponents(repPairs, maxIter)
          .select(col("doc_id").as("rep_id"), col("cluster_id"))
        val groups = keyed.groupBy("h")
          .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_members"))
        val labels = groups.join(repCC, Seq("rep_id"), "left")
          .where(col("cluster_id").isNotNull || col("n_members") >= 2)
          .select(col("h"),
            coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
        val out = keyed.join(labels, Seq("h"))
          .select(col("doc_id"), col("cluster_id"))
        lastTier.put("nearDupClusters", "collapse")
        return out
      }
    }
    lastTier.put("nearDupClusters", "direct")
    // collapseDups=false below: the density was probed (or declined)
    // HERE; re-probing inside minhashNearDup would double the scan
    connectedComponents(
      minhashNearDup(df, idCol, textCol, threshold, n, k, bands,
        collapseDups = false), maxIter)
  }

  /** Round-state materialization — see [[CheckpointCut.cut]] (reliable
    * checkpoint when a checkpoint dir is configured, localCheckpoint
    * otherwise; shared by every iterative operator in the engine). Kept
    * as a local alias because the doubling self-join here would
    * otherwise grow the logical plan ~4^rounds.
    */
  private def checkpointed(df: DataFrame): DataFrame = CheckpointCut.cut(df)

  private def converge(pairs: DataFrame, maxIter: Int): DataFrame = {
    import org.apache.spark.sql.graft.shims.releaseCheckpoint
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // checkpoint (not persist) for every loop-carried table — see
    // [[checkpointed]]; blocks of the retired round are released
    // explicitly as the loop advances.
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = checkpointed(fwd
      .unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())

    // seed with the 2-hop minimum in ONE plan: near-dup components are
    // shallow (stars/short chains around a common source), so most of
    // the graph converges before the loop even starts — each avoided
    // round is a join+agg job AND a codegen compilation
    val oneHop = edges
      .join(edges.select(col("src").as("dst"), col("dst").as("hop2")), Seq("dst"))
      .select(col("src"), col("hop2").as("dst"))
      .unionByName(edges)
    var state = checkpointed(oneHop
      .groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label")))
    def labels = state.select("id", "label")

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // hop: pull the minimum label across one edge
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist(MEMORY_AND_DISK)
      // MATERIALIZE before the doubling self-join reads it twice: fanning
      // out over a lazily-populated cache degrades GEOMETRICALLY as a
      // component's converged rows (duplicate join keys) grow — measured
      // ×4 per round on a path graph, turning O(log d) rounds into
      // minutes — while two scans of a populated cache are constant-time.
      stepped.count()
      // double: label ← label(label) — composing the label map with
      // itself folds chains in half, the geometric-convergence step.
      // Labels are always ids of nodes in the same component (min over
      // reachable ids), so the lookup stays inside the label table; the
      // left join guards root rows whose label is their own id.
      // Monotone: label(label(v)) ≤ label(v).
      val next = checkpointed(stepped.as("s")
        .join(stepped.select(col("id").as("label"), col("label").as("label2")).as("p"),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
        .join(labels.select(col("id"), col("label").as("prev")), Seq("id"))
        .select(col("id"), col("label"), (col("label") < col("prev")).as("improved")))
      changed = next.where(col("improved")).count()
      stepped.unpersist(blocking = false)
      releaseCheckpoint(state) // retire the previous round's blocks
      state = next
      iter += 1
    }
    lastConvergenceRounds = iter
    if (changed > 0) {
      releaseCheckpoint(state)
      releaseCheckpoint(edges)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph radius exceeds the 2-hop seed + doubling budget); " +
          "raise maxIter rather than consuming non-minimal cluster ids")
    }
    releaseCheckpoint(edges)
    val out = state.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    // Memoize the converged labels against this pair plan (bounded LRU —
    // N calls across a few corpora hold a few converged tables, not N).
    // An EVICTED entry's blocks are NOT released eagerly: an in-flight
    // query may still be reading them, and a checkpoint has no lineage
    // to recompute from — an eager release surfaces as
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query. Dropping the
    // reference is enough: the ContextCleaner unpersists the blocks
    // (and, with cleanCheckpoints=true, deletes the files) once every
    // reader's plan is garbage.
    memoPut(MemoEntry(pairs, out, iter))
    out
  }

  private val ccLock = new Object

  /** A memoized convergence: pair-plan key, converged labels (a
    * projection over the checkpointed state), and the rounds it took;
    * see [[connectedComponents]]. Plan-keyed, session-checked.
    */
  private final case class MemoEntry(key: DataFrame, labels: DataFrame, rounds: Int)

  /** LRU depth: covers a handful of alternating corpora (the capstone +
    * a second pipeline + ad-hoc queries) without holding unbounded
    * converged state. Deliberately small — each entry pins a
    * corpus-sized checkpoint.
    */
  private val labelMemoMax = 4

  /** Most-recently-used first. Mutated only via [[memoPut]]/[[memoHit]]
    * (atomic immutable-list swaps); entries from stopped sessions are
    * dropped on the next put.
    */
  private val labelMemo =
    new java.util.concurrent.atomic.AtomicReference[List[MemoEntry]](Nil)

  private def sameKey(a: DataFrame, b: DataFrame): Boolean =
    (a.sparkSession eq b.sparkSession) &&
      a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed)

  private def memoPut(e: MemoEntry): Unit = {
    labelMemo.updateAndGet { old =>
      val kept = old.filterNot(x =>
        x.key.sparkSession.sparkContext.isStopped || sameKey(x.key, e.key))
      (e :: kept).take(labelMemoMax)
    }
    ()
  }

  /** Find a usable entry and move it to the front (LRU touch). */
  private def memoHit(pairs: DataFrame, maxIter: Int): Option[MemoEntry] = {
    if (pairs.sparkSession.sparkContext.isStopped) return None
    val hit = labelMemo.get().find(x => x.rounds <= maxIter && sameKey(x.key, pairs))
    hit.foreach { e =>
      // re-cap on touch: a concurrent memoPut may have evicted e between
      // the read and this update — re-prepending without the take would
      // resurrect it and grow the list past the cap
      labelMemo.updateAndGet(old =>
        (e :: old.filterNot(_ eq e)).take(labelMemoMax)); ()
    }
    hit
  }

  /** Rounds the last [[connectedComponents]] convergence took (0 when
    * the 2-hop seed already converged everything; memo hits don't
    * update it). Observability/test hook, driver-side only.
    */
  @volatile var lastConvergenceRounds: Int = -1

  /** Memo hit requires the caller's round budget to COVER the recorded
    * convergence — a maxIter smaller than the rounds actually used must
    * keep its contract (converge within budget or throw) rather than
    * silently ride a cheaper earlier call's result.
    */
  private def cachedLabels(pairs: DataFrame, maxIter: Int): Option[DataFrame] =
    memoHit(pairs, maxIter).map(_.labels)

  // -------------------------------------------------------------- SimHash

  /** SimHash near-duplicate pairs: signature via [[graft.functions.SimHash]],
    * candidates from equality of any 16-bit chunk (pigeonhole over hamming
    * ≤ maxHamming ≤ 3), verified with bit_count(xor).
    */
  def simhashNearDup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingNearDupPairs(
      df.select(
        col(idCol).as("doc_id"),
        graft.functions.SimHash.simhash64(TextAnalysis.tokens(col(textCol))).as("sig")),
      "doc_id", "sig", maxHamming)

  /** Overlap-coefficient (Szymkiewicz–Simpson / containment) near-dup
    * pairs — the ASYMMETRIC complement of the Jaccard tier: normalizing
    * the shared-shingle count by the SMALLER document's shingle set
    * catches doc-inside-doc (quotes, mirrored articles embedded in
    * boilerplate, clone fragments) that Jaccard structurally misses —
    * a short doc fully contained in a long one has tiny Jaccard but
    * containment ≈ 1.
    *
    * Same inverted-index shape as `ngramJaccardPairs` (group by
    * shingle, pair within the group — never all-pairs), same integer
    * cross-multiplied threshold (`shared·10000 ≥ minBp·min(na,nb)` —
    * floors only over-generate, never lose a pair). The prefix-filter
    * acceleration doesn't port here (it prunes by JACCARD-infeasible
    * size ratios, which containment exactly wants to keep), so this is
    * the exact tier; at corpus scale pair the candidate generation
    * with a hot-shingle cap like `coOccurrenceEdges.maxItemEntities`.
    *
    * @return (id_a, id_b, shared, n_small, contain_bp) pairs at or
    *         above the threshold, id_a < id_b
    */
  def overlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minBp: Long = 9000L): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.NGramShingles.ngram_shingles(col(textCol), n)).as("g"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("g"), col("doc_id").as("id_a"))
    val b = sh.select(col("g"), col("doc_id").as("id_b"))
    a.join(b, Seq("g")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .where(col("shared") * 10000 >= lit(minBp) * least(col("na"), col("nb")))
      .select(col("id_a"), col("id_b"), col("shared"),
        least(col("na"), col("nb")).as("n_small"),
        expr("shared * 10000 div least(na, nb)").as("contain_bp"))
  }

  /** Pigeonhole hamming join over any precomputed 64-bit signature
    * column (SimHash, image aHash, audio fingerprint): 4 chunks of 16
    * bits guarantee that any pair within hamming ≤ 3 agrees on at least
    * one whole chunk, so candidates come from 4 equi-joins instead of
    * all pairs; the exact `bit_count(xor)` verify then keeps no false
    * positives. EXACT for maxHamming ≤ 3 — never a recall trade.
    */
  def hammingNearDupPairs(
      sig: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4 chunks of 16 bits cover hamming<=3")
    // The signature table feeds BOTH sides of the chunk self-join, and
    // Spark does not common-subexpression the DataFrame DAG — so an
    // expensive upstream (the m5/m7 image/audio container decode + hash,
    // ~2.3 executor-CPU-s per evaluation at sf0.1) ran TWICE per query.
    // One bounded cached copy (tiny: one (id, sig) row per doc) makes it
    // one decode pass. Streaming callers bypass the cache (persist is
    // unsupported on streaming plans); all current callers are batch.
    val proj = sig.select(col(idCol).as("doc_id"), col(sigCol).as("sig"))
    val s = if (sig.isStreaming) proj else hammingSigSlot.persist(proj)
    val chunks = s.select(
      col("doc_id"), col("sig"),
      posexplode(array((0 to 3).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk_idx", "chunk")))

    val cand = chunks.as("x")
      .join(chunks.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
          col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .distinct()

    cand
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

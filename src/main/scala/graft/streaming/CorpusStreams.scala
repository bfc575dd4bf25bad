package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Streaming corpus hygiene: gate a continuous document feed against a
  * FROZEN historical corpus — the continuous-ingestion counterpart of
  * [[graft.ops.Dedup.minhashNearDup]]. A crawl pipeline that lands new
  * documents hourly cannot re-run batch dedup over the full corpus per
  * batch; it needs each arriving doc checked against history NOW, with
  * per-batch cost proportional to the batch.
  *
  * Design — every stage is STATELESS (append mode, no watermark, no
  * streaming state at all):
  *   - history → one MinHash kernel pass → a slim banded key table
  *     (band_idx, band_key, hist_id) + a signature/shingle table,
  *     both computed ONCE and persisted across micro-batches (at
  *     100 TB, write them with [[graft.sources.Bucketing]] bucketed by
  *     band_key instead, so per-batch joins co-locate with zero
  *     corpus-side shuffle — same artifact flow as the written IVF
  *     index);
  *   - each micro-batch: the same kernel as a projection (the
  *     expression is deterministic and stateless, so stream and batch
  *     twins agree bit-for-bit), band explode, equi-join against the
  *     band table, exact-Jaccard verify.
  *   - band-collision dedup is ALGEBRAIC, not stateful: a pair that
  *     collides in several bands is kept only at its FIRST agreeing
  *     band — `array_position(zip_with(bands_a, bands_b, =), true)`,
  *     a pure function of the two signatures (the same
  *     first-overlap-bucket trick as [[graft.ops.RangeJoin]]) — where
  *     a `dropDuplicates` would grow unbounded streaming state.
  *
  * In-stream duplicates (doc repeated WITHIN the feed) are a separate
  * concern: compose with the watermarked exact dedup
  * ([[EventStreams]]/e6) upstream; this op's contract is only
  * "arriving doc vs history".
  */
object CorpusStreams {

  /** Near-dup pairs (stream_id, hist_id, jaccard ≥ threshold) between a
    * (possibly streaming) document feed and a static history corpus.
    * Works identically on a batch `docs` frame — the spec's twin
    * equivalence relies on that.
    *
    * Banding parameters mirror [[Dedup.minhashNearDup]] (k=128/32
    * bands: candidate recall 1−5e−8 at j=0.8); false positives are
    * removed by the exact verify, so the output matches the exact
    * cross-corpus Jaccard join (the e20 oracle).
    */
  def nearDupVsHistory(
      docs: DataFrame,
      history: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      n: Int = 3,
      k: Int = 128,
      bands: Int = 32): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    // static side, computed once per query: signatures + slim band keys
    val histSigs = histSlot.persist(
      Dedup.minhashSignatures(history, idCol, textCol, n, k)
        .select(col("doc_id").as("hist_id"), col("sh").as("sh_b"),
          col("sig").as("sig_b")))
    val histBands = bandSlot.persist(histSigs.select(col("hist_id"),
      posexplode_outer(graft.functions.MinHash.bands_from_sig(col("sig_b"), bands))
        .as(Seq("band_idx", "band_key"))))

    // stream side: stateless projections only (no repartition — the
    // micro-batch is already the unit of parallelism here, and
    // minhashSignatures' CPU-spread repartition is a batch concern)
    val sSigs = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("stream_id"),
        graft.functions.NGramShingles.ngram_shingles(col(textCol), n).as("sh_a"))
      .withColumn("sig_a", graft.functions.MinHash.minhash_sig(col("sh_a"), k))
    val sBands = sSigs.select(col("stream_id"), col("sh_a"), col("sig_a"),
      posexplode_outer(graft.functions.MinHash.bands_from_sig(col("sig_a"), bands))
        .as(Seq("band_idx", "band_key")))

    val margin = 6.0 * math.sqrt(threshold * (1.0 - threshold) / k)
    sBands
      .join(histBands, Seq("band_idx", "band_key"))
      .join(histSigs, Seq("hist_id"))
      // first-agreeing-band filter: deduplicates multi-band collisions
      // without state (1-based array_position vs 0-based band_idx)
      .where(col("band_idx") === array_position(
        zip_with(
          graft.functions.MinHash.bands_from_sig(col("sig_a"), bands),
          graft.functions.MinHash.bands_from_sig(col("sig_b"), bands),
          (a, b) => a === b),
        true) - 1)
      // cheap signature pre-filter, then the exact verify (same margin
      // discipline as minhashNearDup: a true pair at j=threshold is
      // pre-filtered away with p≈1e-9)
      .where(graft.functions.MinHash.sig_overlap(col("sig_a"), col("sig_b"))
        >= threshold - margin)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select(col("stream_id"), col("hist_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // bounded slots (same discipline as Dedup's): a new history evicts
  // the previous query's corpus-sized cached tables
  private val histSlot = new graft.ops.CacheSlot
  private val bandSlot = new graft.ops.CacheSlot
}

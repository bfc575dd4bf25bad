package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 0
    (2L, "entirely different words about spark and scala engines"),
    (3L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical text; lowest id is the keeper") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 5 docs, one exact pair
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("shingles: n-grams for long text, whole text for short") {
    val sh = docs.select(Dedup.shingles(col("text"), 3).as("s"), col("doc_id"))
    val forDog = sh.where($"doc_id" === 0L).head().getSeq[String](0)
    assert(forDog.contains("the quick brown"))
    assert(forDog.contains("the lazy dog"))
    assert(forDog.length == 7) // 9 words -> 7 trigrams, all distinct
    val short = sh.where($"doc_id" === 4L).head().getSeq[String](0)
    assert(short == Seq("short text"))
  }

  test("minhash LSH finds the exact pair and the near pair, not the unrelated") {
    val pairs = Dedup.minhashNearDup(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup, jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // 6/8 shared trigrams
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("connected components: chains merge, separate clusters stay apart") {
    // 1-2, 2-3, 3-4 chain (diameter 3) plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components: pointer doubling converges a deep chain in O(log d) rounds") {
    // path 0-1-2-...-40: diameter 40. Plain min-label propagation after
    // the 2-hop seed would need ~38 rounds; doubling must fold it into
    // far fewer — maxIter=8 both proves the geometric convergence and
    // guards against a regression to linear propagation.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(chain, maxIter = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 41 && cc.values.forall(_ == 0L), cc)
    assert(Dedup.lastConvergenceRounds <= 8)
  }

  test("connected components: converged labels are memoized per pair plan (LRU)") {
    def pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    def pairsB = Seq((5L, 6L)).toDF("id_a", "id_b")
    val first = Dedup.connectedComponents(pairs)
    first.collect()
    // a structurally-equal (but fresh) pair plan must hit the memo:
    // the SAME DataFrame comes back, no re-convergence
    assert(Dedup.connectedComponents(pairs) eq first)
    // a different pair plan misses (fresh convergence) but does NOT
    // evict — the memo is a small LRU, not a single slot
    val other = Dedup.connectedComponents(pairsB)
    assert(!(other eq first))
    assert(other.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(5L -> 5L, 6L -> 5L))
    // ALTERNATING corpora both stay memo hits: A, B, A, B pays for two
    // convergences total, not four (the round-3 single-slot memo
    // re-converged on every alternation)
    assert(Dedup.connectedComponents(pairs) eq first)
    assert(Dedup.connectedComponents(pairsB) eq other)
  }

  test("connected components: reliable checkpoints when a checkpoint dir is set") {
    // the cluster path (dynamic allocation survives executor loss only
    // with reliable checkpoints); local mode covers the mechanics
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val cc = Dedup.connectedComponents(
        Seq((100L, 101L), (101L, 102L)).toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == Map(100L -> 100L, 101L -> 100L, 102L -> 100L))
      // retired rounds' checkpoint FILES must be deleted as the loop
      // advances (Spark's cleaner ignores them by default) — only the
      // final, memoized state may remain on disk
      import scala.jdk.CollectionConverters._
      val rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("rdd-")).toSeq
      assert(rddDirs.size == 1, s"leaked checkpoint dirs: $rddDirs")
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("ngram jaccard matches hand-computed similarity") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((0L, 3L)) == 1.0)
    // docs 0/1 differ in last word: trigrams 7+7, shared 6 -> 6/8
    assert(out((0L, 1L)) == 0.75)
  }

  test("prefix-filtered jaccard equals the naive inverted index exactly") {
    // hand corpus at two thresholds…
    for (t <- Seq(0.5, 0.8)) {
      val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == naive, s"threshold $t")
    }
    // …and a generated one with heavy shared vocabulary (the stopword-head
    // regime prefix filtering exists for), including ulp-sensitive sizes:
    // docs whose shingle count is a multiple of 5 exercise the ⌈0.8·n⌉
    // basis-point ceil against double rounding.
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val gen = (0 until 120).map { i =>
      val base = (0 until 8 + i % 7).map(j => words((i + j * j) % 10))
      (i.toLong, (base :+ words(i % 3)).mkString(" "))
    }.toDF("doc_id", "text")
    val naive = Dedup.ngramJaccardPairs(gen, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.ngramJaccardPairsPrefix(gen, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == naive)
    assert(naive.nonEmpty) // the generator must actually produce near-dups
  }

  test("ngram jaccard pair list is slot-cached per (corpus, threshold, n): " +
      "repeat calls return the cached handle, a new threshold a new entry") {
    // the pair list is a tiny match-sized output of a corpus-wide join;
    // one session computes the IDENTICAL relation from the standalone
    // pair query, the keep-best dedup, and the band sweep's truth set —
    // the slot makes the second and third consumers block reads
    val a = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
    val b = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
    assert(b eq a, "identical (corpus, threshold, n) must return the cached handle")
    assert(!(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9) eq a))
    val p = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.5)
    assert(Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.5) eq p)
    assert(!(p eq a), "prefix and naive tiers are distinct plans/entries")
  }

  test("adaptive jaccard picks a tier per corpus skew; result identical") {
    // benign hand corpus: candidate rows per posting is tiny -> must
    // dispatch naive AND return the naive result set
    val naive = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val auto = Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == naive)
    // a corpus that is ONE token repeated across every doc: every posting
    // self-joins with every other (cand/postings ≈ n/2), so with a cutoff
    // below that the skew branch must dispatch prefix — checked by result
    // equality under a cutoff chosen so only the skew branch can pass
    // both corpora (prefix == naive is pinned by the test above; here we
    // pin that the DISPATCH happens by driving the ratio across the
    // cutoff in both directions with the same corpus)
    val boiler = (0 until 64).map(i => (i.toLong, "same same same same " + i))
      .toDF("doc_id", "text")
    val lo = Dedup.ngramJaccardPairsAuto(boiler, "doc_id", "text", 0.5, 3, candPerPosting = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val hi = Dedup.ngramJaccardPairsAuto(boiler, "doc_id", "text", 0.5, 3, candPerPosting = 1e9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ref = Dedup.ngramJaccardPairs(boiler, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lo == ref && hi == ref)
  }

  test("simhash: exact dup pairs at hamming 0; unrelated text filtered") {
    val out = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out((0L, 3L)) == 0)
    assert(!out.keySet.exists(p => p._1 == 2L || p._2 == 2L))
  }

  // 30 chars each; doc 1 embeds doc 0's 20-char prefix at offset 2;
  // doc 2 is an exact copy of doc 0; doc 3 is unrelated
  private val spanDocs = Seq(
    (0L, "abcdefghijKLMNOPQRSTuvwxyz0123"),
    (1L, "XXabcdefghijKLMNOPQRSTZZ"),
    (2L, "abcdefghijKLMNOPQRSTuvwxyz0123"),
    (3L, "000000000011111111112222222222")
  ).toDF("doc_id", "text")

  test("repeated spans: keep-first, maximal merge, exact offsets") {
    val out = Dedup.repeatedSpans(spanDocs, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 0 holds every first occurrence -> no spans; doc 1's embedded
    // prefix flags as exactly [2, 22); the full copy flags end-to-end.
    // doc 3 has NO repeated 10-gram (each all-same run is exactly 10
    // chars, so e.g. "0000000000" occurs at one position only)
    assert(out == Set((1L, 2L, 22L), (2L, 0L, 30L)), out)
  }

  test("cutting spans keeps one copy of every repeated passage") {
    val out = Dedup.cutRepeatedSpans(
        spanDocs.where($"doc_id" < 3), "doc_id", "text", minLen = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "abcdefghijKLMNOPQRSTuvwxyz0123") // first copy untouched
    assert(out(1L) == "XXZZ")                            // embedded repeat excised
    assert(out(2L) == "")                                // exact dup fully consumed
  }

  test("span-merge caveat: overlapping repeats can cut into a first occurrence") {
    // The scaladoc'd caveat, pinned. L=10; doc0 = G10+P5, doc1 = G10+P10,
    // doc2 = P10. Doc1's grams at pos 0..5 repeat doc0, so its merged
    // span is [0,15) — overlapping the FIRST occurrence of the P10 gram
    // (doc1 pos 10) and cutting 5 chars out of it; doc2's P10 is a
    // second occurrence and is excised whole. Net: P10 survives intact
    // NOWHERE (doc1 keeps only "PPPPP") — exactly the documented limit
    // of merged-span excision when repeats overlap other repeats.
    val docs = Seq(
      (0L, "G" * 10 + "P" * 5),
      (1L, "G" * 10 + "P" * 10),
      (2L, "P" * 10)
    ).toDF("doc_id", "text")
    val out = Dedup.cutRepeatedSpans(docs, "doc_id", "text", minLen = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "G" * 10 + "P" * 5) // first occurrences: untouched
    assert(out(1L) == "P" * 5)            // span [0,15) ate half of P10
    assert(out(2L) == "")                 // second P10 occurrence: excised
  }

  test("repeated spans: two repeats separated by a unique gap stay two spans") {
    val a = "AAAAAAAAAA" // 10-char block
    val b = "BBBBBBBBBB"
    val docs2 = Seq(
      (0L, a + "-unique-filler-one-" + b),
      (1L, a + "=completely=other=gap=" + b)
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(docs2, "doc_id", "text", minLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d1 = out.filter(_._1 == 1L)
    assert(d1 == Set((1L, 0L, 10L), (1L, 32L, 42L)), out) // b at offset 32 in doc 1
  }

  test("repeated spans are order-independent") {
    val docs = spark.range(300).selectExpr("id AS doc_id",
      "concat('unique prefix number ', id, ' then the same long shared boilerplate tail across docs') AS text")
    val a = Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 40)
    val b = Dedup.repeatedSpans(docs.orderBy(rand(5)), "doc_id", "text", minLen = 40)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // every doc except the first carries exactly one tail span
    assert(a.count() == 299)
  }

  test("overlapPairs: containment catches doc-inside-doc that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = ("padding words start here now " * 6) + short + " closing remarks follow here today"
    val docs = Seq((1L, short), (2L, long), (3L, "unrelated totally different content here"))
      .toDF("doc_id", "text")
    // the short doc's shingles are a subset of the long one's: full containment
    val pairs = Dedup.overlapPairs(docs, "doc_id", "text", n = 3, minBp = 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(pairs.toSeq == Seq((1L, 2L, 10000L)), pairs.toSeq)
    // ...while symmetric Jaccard at the same bar sees nothing
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9, 3).isEmpty)
  }

  test("overlapPairs: threshold floors only over-generate; below-bar pairs drop") {
    // 10-shingle small doc sharing exactly 8 -> 8000 bp < 9000 bar
    val a = (1 to 12).map(i => s"w$i").mkString(" ")        // shingles w1..w10 (10)
    val b = (1 to 10).map(i => s"w$i").mkString(" ") + " x y z" // shares w1 w2 w3..w8 window
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val at8000 = Dedup.overlapPairs(docs, "doc_id", "text", 3, 8000L).collect()
    val at9500 = Dedup.overlapPairs(docs, "doc_id", "text", 3, 9500L).collect()
    assert(at8000.length >= at9500.length) // monotone in the bar
  }

  test("minhashBandSweep: exact dups hit at EVERY tier; candidates nested; full recall") {
    // doc 1 == doc 2 (j = 1 → identical signatures → every tier's first
    // band matches: the theorem, not a hash accident); 3 and 4 distinct
    val dup = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, dup), (2L, dup),
      (3L, (100 to 140).map(i => s"u$i").mkString(" ")),
      (4L, (200 to 240).map(i => s"v$i").mkString(" "))).toDF("doc_id", "text")
    val rep = Dedup.minhashBandSweep(docs, "doc_id", "text", 0.8, 3, 128, Seq(4, 16, 32))
      .orderBy("bands").collect()
    assert(rep.map(_.getInt(0)).toSeq == Seq(4, 16, 32))
    rep.foreach { r =>
      assert(r.getLong(2) == 1L, s"n_truth: $r")       // the one dup pair
      assert(r.getLong(3) == 1L, s"n_hit: $r")         // found at every tier
      assert(r.getLong(4) == 10000L, s"recall: $r")
    }
    // nested candidates: monotone non-decreasing across tiers
    val nc = rep.map(_.getLong(1)).toSeq
    assert(nc == nc.sorted, s"candidates not nested: $nc")
  }

  test("minhashBandSweep: tier validation refuses unsorted tiers and non-dividing k") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashBandSweep(docs, "doc_id", "text", bandTiers = Seq(8, 4))
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashBandSweep(docs, "doc_id", "text", k = 128, bandTiers = Seq(3, 7))
    }
    // tiers that each divide k but are NOT a divisibility chain: the
    // nesting theorem's hypothesis fails, so the sweep must refuse
    intercept[IllegalArgumentException] {
      Dedup.minhashBandSweep(docs, "doc_id", "text", k = 24, bandTiers = Seq(2, 3))
    }
  }

  test("exact-copy collapse tier == the direct quadratic tiers, pair for pair") {
    // replica regime: 3 distinct texts × several exact copies each, one
    // near-dup cross-group pair, one unique text, one NULL text (must
    // pair with nothing in either tier)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = ((1 to 27).map(i => s"w$i") ++ Seq("q1 q2 q3")).mkString(" ")
    val other = (100 to 130).map(i => s"z$i").mkString(" ")
    val docs = (
      (0L to 4L).map(i => (i, base)) ++
      (10L to 13L).map(i => (i, near)) ++
      (20L to 23L).map(i => (i, other)) ++
      Seq((30L, (200 to 230).map(i => s"u$i").mkString(" ")), (31L, null: String))
    ).toDF("doc_id", "text")
    def pairs(collapse: Boolean) =
      Dedup.ngramJaccardPairsAuto(docs, "doc_id", "text", 0.8, 3, collapseDups = collapse)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val collapsed = pairs(collapse = true)
    // the dispatch hook proves the collapse path RAN (not just that the
    // answer matches — a density regression silently routing dense
    // corpora to the quadratic tiers would still pass an answers-only
    // equivalence check)
    assert(Dedup.lastTier.get("ngramJaccard") == "collapse")
    val direct = pairs(collapse = false)
    assert(collapsed == direct, s"collapsed minus direct: ${collapsed -- direct}; " +
      s"direct minus collapsed: ${direct -- collapsed}")
    // the corpus is 13/15 duplicates -> the collapse tier must have run
    // (within-group identity pairs exist and carry exactly 1.0)
    assert(collapsed.exists(_._3 == 1.0))
    assert(!collapsed.exists(p => p._1 == 31L || p._2 == 31L)) // NULL text pairs nothing
  }

  test("minhash collapse tier == the direct LSH pipeline, pair for pair") {
    // same replica regime as the n-gram collapse test: the collapse
    // dispatch must fire ahead of the signature kernel and expand to the
    // identical pair set the direct pipeline finds
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = ((1 to 27).map(i => s"w$i") ++ Seq("q1 q2 q3")).mkString(" ")
    val other = (100 to 130).map(i => s"z$i").mkString(" ")
    val docs = (
      (0L to 4L).map(i => (i, base)) ++
      (10L to 13L).map(i => (i, near)) ++
      (20L to 23L).map(i => (i, other)) ++
      Seq((30L, (200 to 230).map(i => s"u$i").mkString(" ")), (31L, null: String))
    ).toDF("doc_id", "text")
    def pairs(collapse: Boolean) =
      Dedup.minhashNearDup(docs, "doc_id", "text", 0.8, collapseDups = collapse)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val collapsed = pairs(collapse = true)
    assert(Dedup.lastTier.get("minhashNearDup") == "collapse")
    val direct = pairs(collapse = false)
    assert(Dedup.lastTier.get("minhashNearDup") == "direct")
    assert(collapsed == direct, s"collapsed minus direct: ${collapsed -- direct}; " +
      s"direct minus collapsed: ${direct -- collapsed}")
    assert(collapsed.exists(_._3 == 1.0)) // within-group identity pairs
    assert(!collapsed.exists(p => p._1 == 31L || p._2 == 31L)) // NULL text pairs nothing
  }

  test("nearDupClusters: fused collapse labels == direct pipeline labels") {
    // replica regime with every cluster shape the label proof names: a
    // cross-group near-dup cluster (base+near groups merge), an exact-
    // copy-only group (its own cluster), a singleton in no pair
    // (excluded), and a NULL text (excluded)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = ((1 to 27).map(i => s"w$i") ++ Seq("q1 q2 q3")).mkString(" ")
    val other = (100 to 130).map(i => s"z$i").mkString(" ")
    val docs = (
      (0L to 4L).map(i => (i, base)) ++
      (10L to 13L).map(i => (i, near)) ++
      (20L to 23L).map(i => (i, other)) ++
      Seq((30L, (200 to 230).map(i => s"u$i").mkString(" ")), (31L, null: String))
    ).toDF("doc_id", "text")
    def clusters(collapse: Boolean) =
      Dedup.nearDupClusters(docs, "doc_id", "text", 0.8, collapseDups = collapse)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val collapsed = clusters(collapse = true)
    assert(Dedup.lastTier.get("nearDupClusters") == "collapse")
    val direct = clusters(collapse = false)
    assert(Dedup.lastTier.get("nearDupClusters") == "direct")
    assert(collapsed == direct,
      s"collapsed: $collapsed\ndirect: $direct")
    // shape checks: base+near merged under the global min (0), the
    // exact-copy-only group clustered under its own min (20), the
    // singleton (30) and NULL (31) excluded
    assert(collapsed(13L) == 0L && collapsed(4L) == 0L)
    assert(collapsed(23L) == 20L)
    assert(!collapsed.contains(30L) && !collapsed.contains(31L))
  }

  test("minhashBandSweep: each tier reports the REAL b-band deployment's candidates, " +
      "not a prefix of the largest banding") {
    import graft.functions.MinHash
    // two docs sharing most-but-not-all shingles: coarse bands (few
    // bands, many rows each) may miss while fine bands hit — the per-
    // tier count must equal what bands_from_sig(sig, b) itself yields
    val base = (1 to 60).map(i => s"s$i")
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (base.take(55) ++ Seq("q1 q2 q3 q4 q5")).mkString(" ")),
      (3L, (300 to 360).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val rep = Dedup.minhashBandSweep(docs, "doc_id", "text", 0.8, 3, 128, Seq(4, 8, 16, 32))
      .orderBy("bands").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 128)
    Seq(4, 8, 16, 32).foreach { b =>
      val real = sigs
        .select(col("doc_id"),
          posexplode(MinHash.bands_from_sig(col("sig"), b)).as(Seq("band_idx", "band_key")))
        .as("x").join(
          sigs.select(col("doc_id"),
            posexplode(MinHash.bands_from_sig(col("sig"), b)).as(Seq("band_idx", "band_key")))
            .as("y"),
          Seq("band_idx", "band_key"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
      assert(rep(b) == real, s"tier $b: sweep says ${rep(b)}, real $b-band deployment $real")
    }
  }
}

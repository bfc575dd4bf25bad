package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, concat, conv, expr, lit, log, md5, rand, round, row_number, substring, when}
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

  test("decontaminateBloom == decontaminate: the pre-filter changes the plan, not the result") {
    // a generated corpus with planted overlaps: docs ≡0 (mod 5) embed an
    // eval trigram run, others are unique word soup
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven")).toDF("doc_id", "text")
    val train = (1L to 200L).map { i =>
      if (i % 5 == 0) (i, s"doc $i holds alpha beta gamma delta inside word$i filler")
      else (i, s"doc $i pure w${i}a w${i}b w${i}c w${i}d w${i}e filler tail")
    }.toDF("doc_id", "text")
    val exact = Corpus.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tiny filter (2^10 bits for ~1.5k shingles => heavy false-positive
    // traffic) so the verify join provably removes FPs
    val viaBloom = Corpus.decontaminateBloom(train, eval, "doc_id", "text", n = 3,
      numBits = 1 << 10, numHashes = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBloom == exact)
    assert(exact.nonEmpty && exact.keySet.forall(_ % 5 == 0))
  }

  test("sampleFixedPerStratum: exact size, content-stable, small strata intact") {
    val df = (1L to 300L).map(i => (i % 3, i)).toDF("grp", "id")
    val out = Corpus.sampleFixedPerStratum(df, Seq("grp"), "id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.groupBy(_._1).forall(_._2.length == 7))
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted.toSeq == (1 to 7) })
    // content-stable: membership is a function of ids, not row order
    val shuffled = Corpus.sampleFixedPerStratum(
      df.orderBy(rand(42)), Seq("grp"), "id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == shuffled.toSet)
    // a stratum smaller than k returns whole, ranks still dense
    val tiny = Seq((0L, 10L), (0L, 11L), (1L, 20L)).toDF("grp", "id")
    val tout = Corpus.sampleFixedPerStratum(tiny, Seq("grp"), "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(tout.map(t => (t._1, t._2)) == Set((0L, 10L), (0L, 11L), (1L, 20L)))
    // matches the window formulation exactly (the plan it replaces)
    val viaWindow = df
      .withColumn("key", concat(md5(col("id").cast("string")), col("id").cast("string")))
      .withColumn("sample_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("key")))
      .where(col("sample_rank") <= 7)
      .select("grp", "id", "sample_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == viaWindow.toSet)
  }

  test("sampleFixedPerStratum: bounded-heap plan, never a per-stratum window sort") {
    val df = (1L to 100L).map(i => (i % 3, i)).toDF("grp", "id")
    val p = Corpus.sampleFixedPerStratum(df, Seq("grp"), "id", 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"fell back to the window shuffle:\n$p")
    assert(p.contains("partial_top_k_by_score_str"), s"no map-side partial top-k:\n$p")
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

  test("paragraph dedup keeps first corpus-wide occurrence, reassembles in order") {
    val pd = Seq(
      (0L, "alpha one\n\nshared boilerplate\n\nalpha two"),
      (1L, "beta one\n\nshared boilerplate"),        // loses the shared para to doc 0
      (2L, "shared boilerplate"),                    // fully consumed -> disappears
      (3L, "gamma\n\ngamma"),                        // within-doc dup: pos 1 dropped
      (4L, "delta only")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupParagraphs(pd, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == ("alpha one\n\nshared boilerplate\n\nalpha two", 3L))
    assert(out(1L) == ("beta one", 1L))
    assert(!out.contains(2L)) // every paragraph seen earlier -> dropped
    assert(out(3L) == ("gamma", 1L))
    assert(out(4L) == ("delta only", 1L))
  }

  test("paragraph dedup is deterministic under row-order shuffling") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(2000).select(
      $"id".as("doc_id"),
      concat(lit("unique para "), $"id", lit("\n\nshared para "), $"id" % 40).as("text"))
    val a = Corpus.dedupParagraphs(docs, "doc_id", "text")
    val b = Corpus.dedupParagraphs(docs.orderBy(rand(3)), "doc_id", "text")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // each of the 40 shared paras survives exactly once, in its smallest doc
    assert(a.where($"n_kept" === 2).count() == 40)
    assert(a.agg(sum($"n_kept")).head.getLong(0) == 2000L + 40L)
  }

  test("sequence packing lays docs head-to-tail and marks boundary crossings") {
    // one shard so offsets are a simple running sum in doc_id order
    val docs = Seq(
      (0L, "w1 w2 w3 w4"),      // 4 tokens, offset 0, seqs 0..0
      (1L, "w1 w2 w3"),         // 3 tokens, offset 4, crosses 4..6 -> seq 0 (L=6: 4..6 spans 0,1)
      (2L, ""),                 // 0 tokens, offset 7 -> seq 1..1 (empty: first==last)
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8") // 8 tokens, offset 7, spans seqs 1..2
    ).toDF("doc_id", "text")
    val out = Corpus.packSequences(docs, "doc_id", "text", seqLen = 6, shards = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(0L) == ((4L, 0L, 0L, 0L)))  // (n_tokens, offset, first, last)
    assert(out(1L) == ((3L, 4L, 0L, 1L)))  // tokens 4,5,6: crosses the L=6 boundary
    assert(out(2L) == ((0L, 7L, 1L, 1L)))  // empty doc occupies no span
    assert(out(3L) == ((8L, 7L, 1L, 2L)))
  }

  test("sequence packing is content-stable across row order and partitioning") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(5000).select(
      $"id".as("doc_id"),
      concat_ws(" ", array_repeat(lit("tok"), ($"id" % 37 + 1).cast("int"))).as("text"))
    val a = Corpus.packSequences(docs, "doc_id", "text", seqLen = 128, shards = 16)
    val b = Corpus.packSequences(docs.repartition(13).orderBy(rand(9)),
      "doc_id", "text", seqLen = 128, shards = 16)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // within every shard, offsets reconstruct the exact running sum
    val bad = a.withColumn("expected",
        coalesce(sum($"n_tokens").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"shard")
            .orderBy($"doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .where($"tok_offset" =!= $"expected")
    assert(bad.count() == 0)
  }

  test("chunkTokenWindows: overlap, tail chunk, empty/short docs, guard rails") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens
      (2L, "x y"),           // shorter than one window
      (3L, "   "),           // whitespace-only → no tokens → no chunks
      (4L, "")               // empty → no chunks
    ).toDF("doc_id", "text")
    val out = Corpus.chunkTokenWindows(docs, "doc_id", "text", maxTokens = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(out == Set(
      (1L, 0, 3, "a b c"),  // starts 0,2,4,6 — stride-2 overlap of 1 token
      (1L, 1, 3, "c d e"),
      (1L, 2, 3, "e f g"),
      (1L, 3, 1, "g"),      // tail chunk clamps at doc end
      (2L, 0, 2, "x y")))
    // stride == maxTokens: exact partition, no overlap, full coverage
    val flat = Corpus.chunkTokenWindows(docs, "doc_id", "text", maxTokens = 3, stride = 3)
      .where($"doc_id" === 1L).collect().map(_.getString(3)).toSet
    assert(flat == Set("a b c", "d e f", "g"))
    intercept[IllegalArgumentException] {
      Corpus.chunkTokenWindows(docs, "doc_id", "text", maxTokens = 3, stride = 4)
    }
    intercept[IllegalArgumentException] {
      Corpus.chunkTokenWindows(docs, "doc_id", "text", maxTokens = 0, stride = 1)
    }
  }

  test("semanticDedup: transitive cluster collapse; LSH scale path agrees with exact") {
    import org.apache.spark.sql.functions._
    // a chain A≈B≈C where cos(A,C) < θ (A and C only connect THROUGH B),
    // plus an isolated D: the cluster collapses to A alone, D survives
    val a = Array(1.0f, 0.0f)
    val b = Array(math.cos(0.2).toFloat, math.sin(0.2).toFloat) // cos(A,B)=0.980
    val c = Array(math.cos(0.4).toFloat, math.sin(0.4).toFloat) // cos(B,C)=0.980, cos(A,C)=0.921
    val d = Array(0.0f, 1.0f)
    val emb = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("vec_id", "embedding")
    val survivors = Corpus.semanticDedup(emb, "vec_id", "embedding", 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L), s"expected transitive collapse to {1,4}, got $survivors")
    // the LSH-mined pair source must keep the same survivor set
    val viaLsh = Corpus.semanticDedup(emb, "vec_id", "embedding", 0.95, scalePath = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaLsh == survivors)
  }

  test("decontaminateFuzzy: integer threshold is exact at the bar") {
    // eval doc: tokens a..j → its 8-grams include "a..h"
    val eval = Seq((0L, "a b c d e f g h i j")).toDF("doc_id", "text")
    // doc 100: "a..h" + 19 unique tokens = 27 tokens → 20 distinct
    // 8-grams, exactly 1 shared → 1*10000 == 20*500, AT the bar → flagged
    val at = "a b c d e f g h " + (1 to 19).map(i => s"u$i").mkString(" ")
    // doc 101: one more unique token → 21 grams → just under → clean
    val under = at + " u20"
    val train = Seq((100L, at), (101L, under)).toDF("doc_id", "text")
    val out = Corpus.decontaminateFuzzy(train, eval, "doc_id", "text", 8, 500L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_shared")))
    assert(out.toSeq == Seq((100L, 20L, 1L)), out.toSeq)
  }

  test("decontaminateFuzzy: short docs compare whole-text shingles") {
    val eval = Seq((0L, "x y z")).toDF("doc_id", "text")
    val train = Seq(
      (100L, "x y z"),   // whole-text shingle equals eval's → 1/1 flagged
      (101L, "x y w")    // different whole-text shingle → clean
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminateFuzzy(train, eval, "doc_id", "text", 8, 500L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_shared")))
    assert(out.toSeq == Seq((100L, 1L, 1L)), out.toSeq)
  }

  test("cleanLines: word-count and banned-phrase rules, case-insensitive; empty docs drop") {
    val docs = Seq(
      (0L, "good line with words\nxx yy\nbad CLICK Here line\nanother fine line here"),
      (1L, "ok bye\nClick here"),   // every line fails → doc drops
      (2L, "")                      // zero words → doc drops
    ).toDF("doc_id", "text")
    val out = Corpus.cleanLines(docs, "doc_id", "text", 3, Seq("click here"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped")))
    assert(out.toSeq == Seq(
      (0L, "good line with words\nanother fine line here", 2L, 2L)), out.toSeq)
  }

  test("cleanLines: no shuffle — the pass is one projection") {
    val plan = Corpus.cleanLines(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sampleWeighted: heap path equals the window formulation; weights bias the draw") {
    // ids 0..99 carry weight 1000, ids 100..999 weight 1
    val recs = spark.range(1000).select(col("id").as("rid"),
      when(col("id") < 100, 1000L).otherwise(1L).as("w"),
      (col("id") % 2).as("g"))
    val out = Corpus.sampleWeighted(recs, "rid", "w", 25, Seq("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // k per stratum, ranks contiguous from 1
    val byG = out.groupBy(_._1)
    assert(byG.keySet == Set(0L, 1L))
    byG.values.foreach(v => assert(v.map(_._3).sorted.toSeq == (1 to 25)))
    // E-S with 1000x weight: the heavy ids dominate the sample
    val heavy = out.count(_._2 < 100)
    assert(heavy >= 45, s"expected heavy-weight dominance, got $heavy/50")
    // equivalence with the row_number window over the same integer keys
    val u48 = conv(substring(md5(col("rid").cast("string")), 1, 12), 16, 10).cast("long")
    val keyed = recs
      .withColumn("__neg", (-round(log((u48.cast("double") + lit(0.5)) /
        lit(281474976710656.0)) * lit(1e6))).cast("long"))
      .withColumn("__key", -expr("(__neg * 1000000L) div w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("__key").desc, col("rid").asc)
    val expected = keyed.withColumn("rn", row_number().over(win))
      .where(col("rn") <= 25)
      .select(col("g"), col("rid"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out.toSet == expected)
  }

  test("urlBlocklist: suffix semantics — subdomains block, lookalikes don't, longest wins") {
    val urls = Seq(
      (1L, "example.com"),            // exact apex match
      (2L, "a.b.example.com"),        // deep subdomain -> blocked
      (3L, "notexample.com"),         // label boundary: NOT blocked
      (4L, "example.com.evil.org"),   // suffix spoof: NOT blocked
      (5L, "cdn.special.example.com"),// matches apex AND the deeper pattern
      (6L, "clean.org"))
      .toDF("id", "host")
    val pats = Seq("example.com", "special.example.com").toDF("p")
    val out = Corpus.urlBlocklist(urls, "id", "host", pats, "p")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "example.com",
      2L -> "example.com",
      5L -> "special.example.com")) // most specific wins
  }

  test("urlBlocklist: DNS normalization — case folds, trailing root dot strips, both sides") {
    val urls = Seq(
      (1L, "CDN.Example.COM"),   // uppercase host must still block
      (2L, "example.com."),      // fully-qualified root dot must still block
      (3L, "sub.blocked.ORG"))   // matches a pattern that itself needs normalizing
      .toDF("id", "host")
    val pats = Seq("example.com", "Blocked.org.").toDF("p")
    val out = Corpus.urlBlocklist(urls, "id", "host", pats, "p")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // matched_pattern keeps the caller's original spelling
    assert(out == Map(
      1L -> "example.com",
      2L -> "example.com",
      3L -> "Blocked.org."))
  }

  test("canonicalizeUrl: case, www, root dot, default port, fragment, trackers all collapse") {
    val canon = Seq(
      "https://www.Example.COM./p/1?utm_source=a&utm_medium=b#frag",
      "HTTPS://example.com:443/p/1",
      "https://example.com/p/1?gclid=x",
      "https://example.com/p/1").toDF("url")
      .select(Corpus.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(canon == Set("https://example.com/p/1"))
  }

  test("canonicalizeUrl: only the SCHEME'S default port strips — a cross-scheme " +
      "80/443 is a distinct origin and must survive") {
    val out = Seq(
      // default ports for their own scheme: strip
      ("http://e.com:80/p", "http://e.com/p"),
      ("https://e.com:443/p", "https://e.com/p"),
      // the other scheme's default port is NOT this scheme's default:
      // a blanket ':(80|443)' strip would silently merge these origins
      ("http://e.com:443/p", "http://e.com:443/p"),
      ("https://e.com:80/p", "https://e.com:80/p"),
      // root dot still strips in combination with the default port
      ("https://e.com.:443/p", "https://e.com/p"))
      .toDF("url", "want")
      .select(Corpus.canonicalizeUrl(col("url")).as("c"), col("want"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (c, want) => assert(c == want, s"$c != $want") }
  }

  test("canonicalizeUrl: content params survive in order; separators repair around removed trackers") {
    val out = Seq(
      ("https://e.com/s?a=1&utm_source=x&b=2", "https://e.com/s?a=1&b=2"),
      ("https://e.com/s?utm_source=x&a=1", "https://e.com/s?a=1"),
      ("https://e.com/s?a=1&gclid=x", "https://e.com/s?a=1"),
      ("http://e.com:80/s?ref=tw", "http://e.com/s"),
      // non-default port and a 'reform=1' param (prefix of 'ref' must
      // NOT match) are kept
      ("https://e.com:8443/s?reform=1", "https://e.com:8443/s?reform=1"),
      // 'ref' as a SUBSTRING of another param name must not match either
      ("https://e.com/s?preref=2", "https://e.com/s?preref=2"),
      // all params removed → no dangling '?'
      ("https://e.com/s?utm_a=1&gclid=2", "https://e.com/s"))
      .toDF("url", "want")
      .select(Corpus.canonicalizeUrl(col("url")).as("c"), col("want"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    out.foreach { case (c, want) => assert(c == want, s"$c != $want") }
  }

  test("dedupByCanonicalUrl: smallest id survives with the alias count") {
    val out = Corpus.dedupByCanonicalUrl(Seq(
      (7L, "https://www.a.com/x"),
      (3L, "https://a.com/x?utm_source=s"),
      (9L, "https://b.com/y")).toDF("doc_id", "url"), "doc_id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "https://a.com/x" -> ((3L, 2L)),
      "https://b.com/y" -> ((9L, 1L))))
  }

  test("ngramNovelty: hand-counted novel shingles; short docs score as one whole-text shingle") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "x")).toDF("doc_id", "text")
    val ref = Seq((9L, "b c d e")).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: shingles {"a b c","b c d"}; "b c d" is in the reference →
    // 1 of 2 novel. doc 2: one whole-text shingle "x", unseen → 10000
    assert(out == Map(1L -> ((2L, 1L, 5000L)), 2L -> ((1L, 1L, 10000L))))
  }

  test("ngramNovelty: repeated shingles inside one doc count once") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val ref = Seq((9L, "a b a")).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, ref, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // distinct shingles {"a b a","b a b"}; ref contains "a b a" → 1/2
    assert(out == Map(1L -> ((2L, 1L, 5000L))))
  }

  test("sourceOverlap: shared-shingle pair scores; disjoint pairs surface as zero grid rows") {
    import spark.implicits._
    val docs = Seq(("a", "x y z w"), ("b", "x y z"), ("c", "p q r"))
      .toDF("source_in", "text")
    val out = Corpus.sourceOverlap(docs, "source_in", "text", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // a = {'x y z','y z w'}, b = {'x y z'}, c = {'p q r'}:
    // (a,b) shares 1 → jaccard 1/2 = 5000 bp, overlap 1/1 = 10000 bp;
    // (a,c) and (b,c) share nothing and MUST still emit
    assert(out == Map(
      ("a", "b") -> ((2L, 1L, 1L, 5000L, 10000L)),
      ("a", "c") -> ((2L, 1L, 0L, 0L, 0L)),
      ("b", "c") -> ((1L, 1L, 0L, 0L, 0L))))
  }

  test("capPerGroup: best-first survivors, deterministic tie-break, small groups untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 5L)).toDF("doc_id", "src", "score")
    val out = Corpus.capPerGroup(docs, "doc_id", "src", "score", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // a: scores 30(id2), 30(id4), 20, 10 → keep ids 2 and 4 (tie →
    // smaller id first); b keeps its only doc
    assert(out == Map(2L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("wordBlocklist: exact tokens only — no substring false positives; case-folded") {
    import spark.implicits._
    val docs = Seq((1L, "a classic tale"), (2L, "please MERGE this"),
      (3L, "clean text"), (4L, "ass")).toDF("doc_id", "text")
    val out = Corpus.wordBlocklist(docs, "text", Seq("ASS", "merge"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // 'classic' contains 'ass' as a substring but is NOT a blocked token
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1))
  }

  test("dedupKeepBest: clusters keep the highest score (smallest id on ties); singletons survive") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 1L), (5L, 6L), (6L, 6L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Corpus.dedupKeepBest(docs, pairs, "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // chain {1,2,3} → survivor 2 (score 9); {5,6} tie at 6 → smaller id 5
    assert(out == Map(
      2L -> ((1L, 3L, 9L)),
      4L -> ((4L, 1L, 1L)),
      5L -> ((5L, 2L, 6L))))
  }

  test("splitLeakage: only text present in train leaks; within-split dups are not leakage") {
    import spark.implicits._
    val df = Seq(
      ("train", "alpha"), ("train", "beta"),
      ("val", "alpha"),                      // leaks (in train)
      ("val", "gamma"), ("val", "gamma"),    // val-internal dup: NOT leakage
      ("test", "beta"), ("test", "beta"),    // both copies leak
      ("test", "delta")).toDF("split", "text")
    val out = Corpus.splitLeakage(df, "split", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "val" -> ((3L, 1L, 3333L)),
      "test" -> ((3L, 2L, 6666L))))
  }
}

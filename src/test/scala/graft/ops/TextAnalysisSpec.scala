package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("token counts: whitespace runs, empty, punctuation-aware bpe-ish") {
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "a  b\tc") == 3)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "") == 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "   ") == 0)
    // "don't stop!" -> don + ' + t + stop + ! = 5
    assert(one[Int](TextAnalysis.bpeishTokenCount(col("t")), "don't stop!") == 5)
  }

  test("ratios on a known string") {
    // "ab.," -> 2 punct / 4 chars, 2 alpha / 4 chars
    assert(one[Double](TextAnalysis.punctRatio(col("t")), "ab.,") == 0.5)
    assert(one[Double](TextAnalysis.alphaRatio(col("t")), "ab.,") == 0.5)
    assert(one[Double](TextAnalysis.punctRatio(col("t")), "") == 0.0)
  }

  test("language id picks the marker-dominant language") {
    assert(one[String](TextAnalysis.langId(col("t")), "the cat and the dog of the house") == "en")
    assert(one[String](TextAnalysis.langId(col("t")), "el perro y la casa de los gatos") == "es")
    assert(one[String](TextAnalysis.langId(col("t")), "le chat et les chiens des maisons") == "fr")
    assert(one[String](TextAnalysis.langId(col("t")), "der hund und die katze das haus") == "de")
    assert(one[String](TextAnalysis.langId(col("t")), "xyzzy plugh") == "und")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = (s: String) => one[Long](TextAnalysis.fingerprint(col("t")), s)
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a"))
    assert(fp("a b c") != fp("a b"))
  }

  test("native fingerprint kernel equals an independent FNV-1a/64 reimplementation") {
    // reference path: regex-tokenize, join with spaces, fold UTF-8 bytes —
    // structurally unlike the kernel's single byte-scan, so a kernel bug
    // (boundary handling, multi-byte chars, separator fold) can't cancel out
    def ref(s: String): Long = {
      val seq = "\\S+".r.findAllIn(s).mkString(" ")
      var h = 0xcbf29ce484222325L
      for (b <- seq.getBytes("UTF-8")) { h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    val native = (s: String) => one[Long](TextAnalysis.fingerprint(col("t")), s)
    for (s <- Seq("a b c", "  leading and   multi  spaces ", "single",
                  "tab\tand\nnewline", "", "año café 東京"))
      assert(native(s) == ref(s), s"mismatch for <$s>")
  }

  test("fingerprint hashes token boundaries: [ab,c] differs from [a,bc]") {
    val fp = (s: String) => one[Long](TextAnalysis.fingerprint(col("t")), s)
    assert(fp("ab c") != fp("a bc"))
    assert(fp("a b") == fp("  a \t b "), "whitespace layout must not matter")
  }

  test("tfidf: hand-computed weights, smoothed idf, deterministic rank") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana APPLE"),
      (1L, "banana cherry"),
      (2L, "apple")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    // N=3; df(apple)=2, df(banana)=2, df(cherry)=1
    // idf = ln((3+1)/(df+1)) + 1; doc0 apple: tf=2 (case-folded)
    assert(out(0L)._1 == "apple")
    assert(out(0L)._2 == math.rint(2 * (math.log(4.0 / 3.0) + 1) * 1e6) / 1e6)
    assert(out(1L)._1 == "cherry") // rarer beats more frequent banana
    assert(out(2L)._1 == "apple")
  }

  test("tfidf: top-N filter compiles to partial+final WindowGroupLimit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = TextAnalysis.tfidf(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert("WindowGroupLimit".r.findAllIn(p).length == 2, p)
  }

  test("PII redaction masks emails and phone runs, leaves prose intact") {
    val r = (s: String) => one[String](TextAnalysis.redactPii(col("t")), s)
    assert(r("mail bob.smith+x@corp.example.org now") == "mail <EMAIL> now")
    assert(r("call +1 (555) 123-4567 today") == "call <PHONE> today")
    assert(r("no pii here at all") == "no pii here at all")
  }

  test("quality score is in [0,1] and favors clean prose") {
    val q = (s: String) => one[Double](TextAnalysis.qualityScore(col("t")), s)
    val clean = q("the quick brown fox jumps over the lazy dog and runs to the house in the field")
    val junk = q("!!! ??? ,,, ;;; ***")
    assert(clean > junk)
    assert(clean >= 0.0 && clean <= 1.0 && junk >= 0.0 && junk <= 1.0)
  }

  test("gopherRules: each rule fails independently; bounds are inclusive") {
    val docs = Seq(
      // all-pass control: exactly minWords (inclusive bound), stopwords
      // 'the'+'a', mean length within [3,10]
      (1L, "the quick brown fox jumps over a lazy dog today"),
      (2L, "the quick brown fox jumps over a lazy dog now"),
      // mean word length < 3 (mostly 1-char words) → ok_mean_len fails
      (3L, "a b c d e f g h i the"),
      // 8/10 numeric words (4-char, so mean length stays ok) → ok_alpha_words fails
      (4L, "the 1111 2222 3333 4444 5555 6666 7777 a 9999"),
      // no stopwords at all → ok_stopwords fails
      (5L, "quick brown foxes jump over lazy dogs every single day")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text",
        minWords = 10, minStopwords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Boolean]("ok_words"), r.getAs[Boolean]("ok_mean_len"),
          r.getAs[Boolean]("ok_alpha_words"), r.getAs[Boolean]("ok_stopwords"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out(1L) == ((true, true, true, true, true)), out(1L))
    assert(out(2L) == ((true, true, true, true, true)), out(2L))
    assert(out(3L) == ((true, false, true, true, false)), out(3L))
    assert(out(4L) == ((true, true, false, true, false)), out(4L))
    assert(out(5L) == ((true, true, true, false, false)), out(5L))
  }

  test("gopherRules: shuffle-free — one projection over the corpus") {
    val docs = Seq((1L, "the a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lmScore: hand-computed fixed-point terms; sub-bigram docs excluded") {
    // corpus bigrams: (a,b)×2, (a,c)×1 → c1(a)=3
    // term(a,b) = round(ln(2/3)·1e6) = -405465; term(a,c) = round(ln(1/3)·1e6) = -1098612
    val docs = Seq((1L, "a b"), (2L, "A B"), (3L, "a c"), (4L, "solo"), (5L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("logprob_fp"), r.getAs[String]("bucket"))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // docs 4,5 have no bigram
    assert(out(1L) == ((1L, -405465L, "head")), out(1L)) // lowercase fold: doc 2 == doc 1
    assert(out(2L) == ((1L, -405465L, "head")), out(2L))
    assert(out(3L) == ((1L, -1098612L, "head")), out(3L))
  }

  test("lmScore: bucket thresholds are exact long cross-multiplications") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text",
        headAvgMicroNats = -400000L, tailAvgMicroNats = -500000L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("bucket")).toMap
    // -405465 sits strictly between the thresholds; -1098612 is below tail
    assert(out == Map(1L -> "middle", 2L -> "middle", 3L -> "tail"), out)
  }

  test("pmiCollocations: hand-computed micro-nat scores and the minCount gate") {
    // corpus bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a c" -> (a,c)
    // N=4; c2(a,b)=2, cx(a)=3, cy(b)=2 -> pmi = ln(2·4/(3·2)) = ln(4/3)
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val strict = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(strict.toSeq == Seq(("a", "b", 2L, 287682L)), strict.toSeq)
    val all = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // (b,a): cx(b)=1, cy(a)=1 -> ln(1·4/(1·1)) = ln 4 -> 1386294
    // (a,c): cx(a)=3, cy(c)=1 -> ln(4/3) -> 287682
    assert(all == Map(("a", "b") -> 287682L, ("b", "a") -> 1386294L, ("a", "c") -> 287682L), all)
  }

  test("pmiCollocations: case folds and sub-bigram docs contribute nothing") {
    val docs = Seq((1L, "X y"), (2L, "x Y"), (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // both docs fold to (x,y); N=2, cx(x)=2, cy(y)=2 -> pmi = ln(2·2/(2·2)) = 0
    assert(out.toSeq == Seq(("x", "y", 2L, 0L)), out.toSeq)
  }

  private def merges(docs: Seq[(Long, String)], k: Int): Seq[(Int, String, String, Long)] =
    TextAnalysis.bpeTrain(docs.toDF("doc_id", "text"), "text", k)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)

  test("bpeTrain: the banana corpus, every round hand-computed") {
    // words: banana x2, band x1
    // r1 pairs: (b,a)=3 (a,n)=5 (n,a)=4 (n,d)=1          -> an (5)
    // r2: b|an|an|a x2, b|an|d: (b,an)=3 (an,an)=2 (an,a)=2 (an,d)=1 -> ban via (b,an)=3
    // r3: ban|an|a x2, ban|d: (ban,an)=2 (an,a)=2 (ban,d)=1
    //     tie at 2 -> lex: (an,a) < (ban,an)             -> ana via (an,a)
    //     [an,a are ADJACENT in ban|an|a: the merge rewrites to ban|ana]
    // r4: ban|ana x2, ban|d: (ban,ana)=2 (ban,d)=1       -> banana
    // r5: ban|d: (ban,d)=1                               -> band
    // r6: no pairs left -> round absent
    val out = merges(Seq((1L, "banana banana band")), 6)
    assert(out == Seq(
      (1, "a", "n", 5L),
      (2, "b", "an", 3L),
      (3, "an", "a", 2L),
      (4, "ban", "ana", 2L),
      (5, "ban", "d", 1L)), out)
  }

  test("bpeTrain: self-pair merges are left-to-right non-overlapping") {
    // 'aaaa': (a,a) counts 3 (adjacent positions), merges to aa|aa — ONE
    // greedy pass, not the overlapping aaa
    val out = merges(Seq((1L, "aaaa")), 2)
    assert(out == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)), out)
  }

  test("bpeTrain: separator-bearing words drop; frequency weights the argmax") {
    // 'xy' x3 outweighs 'ab' x2; the piped word never contributes
    val out = merges(Seq((1L, "xy xy xy ab ab a|b a|b a|b a|b")), 1)
    assert(out == Seq((1, "x", "y", 3L)), out)
  }

  test("bpeTrain: multi-byte codepoints are single symbols at round 0") {
    val out = merges(Seq((1L, "ñü ñü")), 1)
    assert(out == Seq((1, "ñ", "ü", 2L)), out)
  }

  test("bpeEncode: hand merge table, left-to-right apply, per-doc counts") {
    // merges: (a,n) then (an,a). "banana" = b|a|n|a|n|a -> b|an|an|a -> b|an|ana = 3
    // "ban" = b|a|n -> b|an = 2; "nab" = n|a|b (no |a||n| pair) -> 3
    val mt = Seq((1, "a", "n", 0L), (2, "an", "a", 0L))
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
    val docs = Seq(
      (7L, "banana ban banana"),
      (8L, "nab"),
      (9L, "pipe|word only"),   // pipe word drops; 'only' counts o,n,l,y=4
      (10L, "   ")              // no words -> absent from result
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", mt)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(7L) == ((3L, 8L)), out.get(7L))
    assert(out(8L) == ((1L, 3L)), out.get(8L))
    assert(out(9L) == ((1L, 4L)), out.get(9L))
    assert(!out.contains(10L))
  }

  test("bpeEncode composed with bpeTrain: trained merges shrink the token count") {
    val docs = Seq((1L, "aa aa aa ab"), (2L, "aa ab ab")).toDF("doc_id", "text")
    // train 1 merge: pair (a,a) count 5 beats (a,b) 3 -> merge 'aa'
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text",
        TextAnalysis.bpeTrain(docs, "text", merges = 1))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: aa->1 token x3, ab->2 -> (4 words, 5 tokens); doc2: 1+2+2 -> (3, 5)
    assert(out(1L) == ((4L, 5L)), out.get(1L))
    assert(out(2L) == ((3L, 5L)), out.get(2L))
  }

  test("nfc_normalize: canonical equivalents collapse; normalized text unchanged") {
    // e + COMBINING ACUTE -> U+00E9; ANGSTROM SIGN -> U+00C5
    assert(one[String](graft.functions.NfcNormalize.nfc_normalize(col("t")),
      "café") == "café")
    assert(one[String](graft.functions.NfcNormalize.nfc_normalize(col("t")),
      "Ångström") == "Ångström")
    // already-NFC (incl. pure ASCII) is the identity fast path
    assert(one[String](graft.functions.NfcNormalize.nfc_normalize(col("t")),
      "plain ascii") == "plain ascii")
    // compatibility (NFKC-only) differences are NOT touched by NFC:
    // fullwidth A stays fullwidth
    assert(one[String](graft.functions.NfcNormalize.nfc_normalize(col("t")),
      "Ａ") == "Ａ")
    // registered on the SQL surface
    graft.GraftExtensions.register(spark)
    // (not chr(769): Spark's chr is mod-256 byte semantics, unlike
    // DuckDB's codepoint chr — the SQL literal carries the escape)
    assert(spark.sql("SELECT nfc_normalize('cafe\\u0301') v")
      .head().getString(0) == "café")
  }

  test("cleanText: control strip keeps structure, CRLF folds, whitespace collapses") {
    val c = TextAnalysis.cleanText(col("t"))
    // BEL stripped, tab run collapsed, trim applied
    assert(one[String](c, " a\u0007b\t\tc ") == "ab c")
    // CR dies with the control class, so CRLF canonicalizes to LF;
    // newline survives (paragraph structure is load-bearing downstream)
    assert(one[String](c, "line1\r\nline2") == "line1\nline2")
    // NFC runs FIRST: the decomposed accent composes before any regex
    assert(one[String](c, "café  x") == "café x")
    // null in, null out (all three stages are null-propagating)
    val n = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(c.as("v")).head()
    assert(n.isNullAt(0))
  }

  test("lmScoreHeldOut: add-one smoothing, hand-computed for all three branches") {
    // train "a b a c": bigrams (a,b),(b,a),(a,c); c1: a=2, b=1; V = 3+1
    val train = Seq((1L, "a b a c")).toDF("doc_id", "text")
    def scoreOf(text: String): (Long, Long, Long) = {
      val r = TextAnalysis
        .lmScoreHeldOut(train, Seq((9L, text)).toDF("doc_id", "text"), "doc_id", "text")
        .collect().head
      (r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def fp(p: Double): Long = math.round(math.log(p) * 1e6)
    // seen bigram: p(b|a) = (1+1)/(2+4); unseen w2 of seen w1: p(z|b) = 1/(1+4)
    val (n1, lp1, avg1) = scoreOf("a b z")
    assert(n1 == 2L)
    assert(lp1 == fp(2.0 / 6) + fp(1.0 / 5), s"$lp1")
    assert(avg1 == -((-lp1) / 2))
    // unseen context: p(r|q) = 1/V = 1/4
    val (n2, lp2, _) = scoreOf("q r")
    assert(n2 == 1L && lp2 == fp(1.0 / 4), s"$lp2")
  }

  test("vocabularyStats: hand-counted types/tokens/hapax per slice; empty-text slices emit nothing") {
    import spark.implicits._
    // slice a: tokens [the, cat, the, dog] → types {the,cat,dog}=3,
    // hapax {cat,dog}=2, ttr = 30000 div 4 = 7500, hapax_bp = 6666
    // slice b: one word, all ratios 10000
    val docs = Seq(
      ("a", "the cat"), ("a", "THE dog"),
      ("b", "solo"), ("c", "   ")).toDF("slice_in", "text")
    val out = TextAnalysis.vocabularyStats(docs, "slice_in", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out == Map(
      "a" -> ((3L, 4L, 2L, 7500L, 6666L)),
      "b" -> ((1L, 1L, 1L, 10000L, 10000L))))
  }

  test("readability: hand-computed FK milli-grades, including the negative floor case") {
    import spark.implicits._
    val docs = Seq(
      // W=5, S=2, Y=5 → 0.39·2.5 + 11.8·1 − 15.59 = −2.815 (exactly −2815 milli)
      (1L, "The cat sat. It ran!"),
      // W=3, S=1, Y=1 (no vowels → floor at 1): num = −31460, den = 3
      // → floor −10487 (truncation would say −10486)
      (2L, "xz bcd fgh."),
      (3L, "   ")) // no words → no row
      .toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((5L, 2L, 5L, -2815L)),
      2L -> ((3L, 1L, 1L, -10487L))))
  }

  test("zipfSlope: an exact Zipf corpus (f·r constant) fits slope −1 with corr −1") {
    import spark.implicits._
    // counts 12, 6, 4, 3 at ranks 1..4: f = 12/r exactly, so the
    // log-log points are collinear up to micro-nat quantization
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val docs = Seq(("en", text)).toDF("lang_in", "text")
    val r = TextAnalysis.zipfSlope(docs, "lang_in", "text", topRanks = 10).head()
    assert(r.getLong(1) == 4L)
    val slope = r.getLong(2)
    assert(slope >= -1000010L && slope <= -999990L, s"slope $slope")
    assert(r.getAs[Double]("fit_corr") == -1.0)
  }

  test("zipfSlope: a flat (all-equal-frequency) corpus has zero variance in y — slope 0") {
    import spark.implicits._
    // every word once: y is constant → num = 0 → slope 0; corr NULL
    val docs = Seq(("en", "aa bb cc dd")).toDF("lang_in", "text")
    val r = TextAnalysis.zipfSlope(docs, "lang_in", "text", topRanks = 10).head()
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(r.fieldIndex("fit_corr")))
  }

  test("charEntropy: uniform alphabet reads ln(k) exactly; constant spam reads 0") {
    import spark.implicits._
    // 'abcd' uniform over 4 chars → 4 terms of round((1/4)·ln(4)·1e6)
    // = 4·346574 = 1386296; 'aaaa' → ln(1) = 0 exactly
    val docs = Seq((1L, "abcd"), (2L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((4L, 4L, 1386296L)),
      2L -> ((4L, 1L, 0L))))
  }

  private def cs(chunkTokens: Int, docs: (Long, String)*): Map[Long, (String, Long, Long, Long, Option[Long])] = {
    import spark.implicits._
    TextAnalysis.codeSwitching(docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))))
      .toMap
  }

  test("codeSwitching: a half-English half-German page flags exactly its German half") {
    // 40 tokens → two 20-token chunks: chunk 1 carries 5 en markers,
    // chunk 2 carries 4 de markers → doc verdict 'en' (5 > 4), chunk
    // verdicts (en, de) → 1 of 2 informative chunks disagrees = 5000 bp
    val english = "the and of to a " + (1 to 15).map(i => s"x$i").mkString(" ")
    val german = "der die und das " + (1 to 16).map(i => s"y$i").mkString(" ")
    val out = cs(20, (1L, s"$english $german"))
    assert(out(1L) == (("en", 2L, 0L, 1L, Some(5000L))))
  }

  test("codeSwitching: consistent docs read 0; marker-free docs are all-und → NULL ratio") {
    val pure = "the and of to a " + (1 to 15).map(i => s"x$i").mkString(" ") +
      " the and of to a " + (1 to 15).map(i => s"z$i").mkString(" ")
    val noise = (1 to 25).map(i => s"q$i").mkString(" ")
    val out = cs(20, (1L, pure), (2L, noise))
    assert(out(1L) == (("en", 2L, 0L, 0L, Some(0L))))
    assert(out(2L) == (("und", 2L, 2L, 0L, None)))
  }

  private def jsd(docs: (String, String)*): Map[String, (Long, Long, Long, Option[Long])] = {
    import spark.implicits._
    TextAnalysis.jsDivergence(docs.toDF("s", "text"), "s", "text")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))))
      .toMap
  }

  test("jsDivergence: disjoint vocabularies hit the ln2 ceiling; identical mixes read 0") {
    val out = jsd(("a", "aa bb"), ("b", "cc dd"))
    assert(out("a") == ((2L, 2L, 2L, Some(693147L))))
    assert(out("b") == ((2L, 2L, 2L, Some(693147L))))
    val same = jsd(("a", "x y"), ("b", "x y"))
    assert(same("a")._4.contains(0L) && same("b")._4.contains(0L))
  }

  test("jsDivergence: overlap hand case is symmetric and replays the micro-nat terms") {
    // A = 'w w z' (n1=3), B = 'w' (n2=1 from A's view). A-side terms:
    // w: cp=2,cq=1 → 2·ln(4/5)→2·(−223144); z: cp=1,cq=0 → 693147 →
    // stp = 246859; covered q term w: 182322, no uncovered rest →
    // aa = 1·246859 + 3·182322 = 793825, bb = 6 → 132304. The B slice
    // mirrors the same computation (JSD is symmetric for 2 slices).
    val out = jsd(("a", "w w z"), ("b", "w"))
    assert(out("a") == ((3L, 1L, 2L, Some(132304L))))
    assert(out("b") == ((1L, 3L, 1L, Some(132304L))))
  }

  test("jsDivergence: a single-slice corpus has no complement — NULL, never a blow-up") {
    val out = jsd(("only", "w w z"))
    assert(out("only") == ((3L, 0L, 2L, None)))
  }
}

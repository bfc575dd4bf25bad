package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def corr(rows: Seq[(Long, Long, Long)]) = {
    val df = rows.toDF("a", "b", "c")
    val out = Stats.corrMatrix(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"))).head()
    (out.getLong(0),
      Option(out.get(1)).map(_.asInstanceOf[Double]),
      Option(out.get(2)).map(_.asInstanceOf[Double]),
      Option(out.get(3)).map(_.asInstanceOf[Double]))
  }

  test("corrMatrix: perfect linear relations score ±1; the mixed pair matches the hand value") {
    // b = 2a (corr 1), c = -a (corr -1), so corr(b, c) = -1
    val (n, ab, ac, bc) = corr(Seq((1L, 2L, -1L), (2L, 4L, -2L), (3L, 6L, -3L)))
    assert(n == 3L)
    assert(ab.contains(1.0) && ac.contains(-1.0) && bc.contains(-1.0))
  }

  test("corrMatrix: a known non-trivial correlation to 6dp") {
    // a=(1,2,3), b=(1,3,2): n·sab − sa·sb = 3·13 − 6·6 = 3;
    // var terms both 3·14 − 36 = 6 → corr = 3/6 = 0.5
    val (_, ab, _, _) = corr(Seq((1L, 1L, 0L), (2L, 3L, 1L), (3L, 2L, 0L)))
    assert(ab.contains(0.5))
  }

  test("corrMatrix: a constant column yields NULL, never NaN or a divide error") {
    val (_, ab, ac, bc) = corr(Seq((1L, 7L, 1L), (2L, 7L, 2L), (3L, 7L, 3L)))
    assert(ab.isEmpty && bc.isEmpty) // b is constant
    assert(ac.contains(1.0))
  }

  test("corrMatrix: one scan — a single aggregate job, not a job per pair") {
    val sc = spark.sparkContext
    val df = Seq((1L, 2L, 3L), (4L, 5L, 6L)).toDF("a", "b", "c")
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    Stats.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"), "c" -> col("c"))).collect()
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after - before <= 2, s"expected one aggregate job (+possible AQE), got ${after - before}")
  }

  private def outliers(k: Int, rows: (String, Double)*) = {
    import spark.implicits._
    Stats.robustOutliers(rows.toSeq.toDF("k", "value"), "k", "value", k)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("robustOutliers: hand-computed median/MAD; one huge value cannot move either") {
    // 1,2,3,4,100 → median 3.00 (rank ⌈5/2⌉=3), deviations
    // 0,100,100,200,9700 → MAD 1.00; only 97.00 exceeds 3·MAD
    val out = outliers(3, ("a", 1.00), ("a", 2.00), ("a", 3.00),
      ("a", 4.00), ("a", 100.00))
    assert(out("a") == ((5L, 300L, 100L, 1L, 2000L)))
  }

  test("robustOutliers: MAD = 0 when over half the values coincide — every other value flags (Hampel)") {
    val out = outliers(3, ("a", 5.00), ("a", 5.00), ("a", 5.00), ("a", 9.00))
    assert(out("a") == ((4L, 500L, 0L, 1L, 2500L)))
  }

  test("benfordDeviation: string-exact digits, zero-count digits carry full expected mass, refunds by magnitude") {
    import spark.implicits._
    // cents: 100, 1999, -200, 5 → digits 1,1,2,5 (refund by |·|); n=4
    val df = Seq(("a", 1.00), ("a", 19.99), ("a", -2.00), ("a", 0.05),
      ("a", 0.00)).toDF("k", "value") // the 0.00 row must drop
    val out = Stats.benfordDeviation(df, "k", "value")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(out.size == 9)
    assert(out(("a", 1)) == ((4L, 2L, 500000L, 301030L, 198970L)))
    assert(out(("a", 2)) == ((4L, 1L, 250000L, 176091L, 73909L)))
    assert(out(("a", 5)) == ((4L, 1L, 250000L, 79181L, 170819L)))
    // digit 9 never observed → obs 0, deviation = expected mass
    assert(out(("a", 9)) == ((4L, 0L, 0L, 45757L, 45757L)))
  }

  test("robustOutliers: duplicate-heavy histogram ranks — ties are rank-interchangeable") {
    // 1,1,1,2,2 → n=5, r=3 falls inside value 1's [1,3] range → median
    // 1.00; deviations 0(×3),100(×2) → MAD 0; both 2.00s flag at k=3
    val out = outliers(3, ("a", 1.00), ("a", 1.00), ("a", 1.00),
      ("a", 2.00), ("a", 2.00))
    assert(out("a") == ((5L, 100L, 0L, 2L, 4000L)))
  }

  private def psiRows(rows: (String, String, Double)*) =
    rows.toSeq.toDF("k", "side", "v")

  test("psi: hand-replayed two-bin shift — smoothed terms in micro-units") {
    // $1 bins. ref: 0.50×2, 1.50×2; cur: 0.50×1, 1.50×3. B=2, nr'=nc'=6.
    // bin0: ra=2·6=12, rb=3·6=18 → (−6/36)·ln(12/18)·1e6 = 67577.518 → 67578
    // bin1: ra=4·6=24, rb=18   → (6/36)·ln(24/18)·1e6 = 47947.012 → 47947
    val df = psiRows(
      ("k", "ref", 0.50), ("k", "ref", 0.50), ("k", "ref", 1.50), ("k", "ref", 1.50),
      ("k", "cur", 0.50), ("k", "cur", 1.50), ("k", "cur", 1.50), ("k", "cur", 1.50))
    val r = Stats.psi(df, "k", "v", col("side") === "ref", binWidthCents = 100L).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((4L, 4L, 2L, 115525L)))
  }

  test("psi: identical distributions score exactly zero") {
    val df = psiRows(
      ("k", "ref", 0.50), ("k", "ref", 1.50),
      ("k", "cur", 0.50), ("k", "cur", 1.50))
    assert(Stats.psi(df, "k", "v", col("side") === "ref", 100L)
      .head().getLong(4) == 0L)
  }

  test("chiSquareIndependence: perfect 2x2 association scores chi2 = N; empty cells carry expected mass") {
    // o = [[10,0],[0,10]]: every cell term (oN − rc)²/(Nrc) = 5 → chi2 = 20
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "w"))
    val r = Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((20L, 2L, 2L, 1L, 20000000L)))
  }

  test("chiSquareIndependence: a uniform grid is exactly independent — chi2 = 0") {
    val rows = for { a <- Seq("x", "y"); b <- Seq("u", "w"); _ <- 1 to 3 } yield (a, b)
    assert(Stats.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .head().getLong(4) == 0L)
  }

  private def gini(rows: (String, Long)*) = {
    val r = Stats.giniConcentration(rows.toSeq.toDF("k", "v"), "k", "v").head()
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("giniConcentration: equal values score 0; hand case scores the rank formula exactly") {
    // all equal: gini 0, top ⌈4/10⌉=1 unit holds 1/4 = 2500 bp
    assert(gini(("k", 500L), ("k", 500L), ("k", 500L), ("k", 500L)) ==
      ((4L, 2000L, 0L, 1L, 2500L)))
    // 100,100,200,600: num2 = 600+1200+4800 = 6600;
    // gini = (6600 − 5·1000)/(4·1000) = 0.4 → 4000 bp; top unit 600 → 6000 bp
    assert(gini(("k", 100L), ("k", 100L), ("k", 200L), ("k", 600L)) ==
      ((4L, 1000L, 4000L, 1L, 6000L)))
  }

  test("ksSliceDrift: disjoint supports hit D = 1; identical slices hit 0 at the smallest value") {
    val df = Seq(("A", 1.00), ("A", 1.00), ("B", 2.00), ("B", 2.00)).toDF("k", "v")
    val out = Stats.ksSliceDrift(df, "k", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") == ((10000L, 100L)) && out("B") == ((10000L, 100L)))
    val same = Seq(("A", 1.00), ("A", 2.00), ("B", 1.00), ("B", 2.00)).toDF("k", "v")
    val out2 = Stats.ksSliceDrift(same, "k", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out2("A") == ((0L, 100L)) && out2("B") == ((0L, 100L)))
  }

  test("weightedPercentiles: the value splitting the WEIGHT in half, not the rows") {
    // weight = value: 100 + 900 → W = 1000, r50 = 500 lands in 900's
    // [101, 1000] range — the row-median would say 100 or 900 is a
    // coin-flip; the weighted median is decisively 900
    val df = Seq(("k", 100L), ("k", 900L)).toDF("k", "v").withColumn("w", col("v"))
    val r = Stats.weightedPercentiles(df, "k", "v", "w").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 1000L, 900L, 900L)))
    // boundary tie goes LOW: five 100s (w=500) vs one 500 (w=500),
    // r50 = 500 = the top of 100's range
    val df2 = (Seq.fill(5)(("k", 100L)) :+ ("k", 500L)).toDF("k", "v")
      .withColumn("w", col("v"))
    val r2 = Stats.weightedPercentiles(df2, "k", "v", "w").head()
    assert(r2.getLong(3) == 100L && r2.getLong(4) == 500L)
    // non-positive weights are excluded entirely
    val df3 = Seq(("k", 7L, 0L), ("k", 9L, 4L)).toDF("k", "v", "w")
    assert(Stats.weightedPercentiles(df3, "k", "v", "w").head().getLong(3) == 9L)
  }

  test("skyline2D: dominance is strict on at least one axis; exact ties both survive") {
    // (1,5) frontier; (3,3) frontier; (2,3) dominated by (3,3) [≥,≥ with >x];
    // (3,1) dominated same-x by (3,3); (0,5) dominated by (1,5)
    val df = Seq((1L, 5L), (3L, 3L), (2L, 3L), (3L, 1L), (0L, 5L))
      .toDF("x0", "y0")
    val out = Stats.skyline2D(df, "x0", "y0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 5L, 1L), (3L, 3L, 1L)))
    // duplicated pair: mutually non-dominating, kept once with n=2
    val dup = Seq((4L, 4L), (4L, 4L), (5L, 3L)).toDF("x0", "y0")
    val out2 = Stats.skyline2D(dup, "x0", "y0").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 == Set((4L, 4L, 2L), (5L, 3L, 1L)))
  }

  test("robustOutliersCents: negative residuals — ABS deviations and the k·MAD gate " +
       "agree with the dollars path") {
    // residuals −300, −100, 0, 100, 300: median 0, deviations
    // {0,100,100,300,300} → MAD 100 (rank 3); |±300| > 3·100 is false
    // at equality — no outliers
    val df = Seq(("k", -300L), ("k", -100L), ("k", 0L), ("k", 100L), ("k", 300L))
      .toDF("k", "cents")
    val r = Stats.robustOutliersCents(df, "k", "cents", k = 3).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((5L, 0L, 100L, 0L, 0L)))
  }

  test("tCloseness: a group matching the corpus mix scores 0; a homogeneous group " +
       "scores the corpus complement; absent levels carry their mass") {
    // corpus: 8 rows, sens mix u:4, w:4 (50/50).
    // g1 mirrors it (2u, 2w) → t = 0. g2 is all-u (4u) →
    // t = ½(|1−½| + |0−½|) = ½ → 5000 bp, t_ok fails at 2000
    val df = Seq(
      ("g1", "u"), ("g1", "u"), ("g1", "w"), ("g1", "w"),
      ("g2", "u"), ("g2", "u"), ("g2", "u"), ("g2", "u"),
      ("g3", "w"), ("g3", "w"), ("g3", "w"), ("g3", "w")).toDF("qi", "sens0")
    // corpus mix is u:6/12, w:6/12
    val out = Stats.tCloseness(df, Seq("qi"), "sens0", maxTbp = 2000L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out("g1") == ((4L, 0L, 1)))
    assert(out("g2") == ((4L, 5000L, 0)))
    assert(out("g3") == ((4L, 5000L, 0)))
  }

  test("quantileBins: exact quartile cuts, ties land in the lower bin") {
    val df = Seq.tabulate(8)(i => ("k", (i + 1).toDouble)).toDF("k", "v")
    // values 100..800 cents, n=8: cuts at ranks 2/4/6 → 200/400/600
    val out = Stats.quantileBins(df, "k", "v", nBins = 4).collect()
      .map(r => r.getInt(1) -> ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out == Map(
      0 -> ((2L, Some(200L))), 1 -> ((2L, Some(400L))),
      2 -> ((2L, Some(600L))), 3 -> ((2L, None))))
    // all-equal values: every row ties at every cut → everything bin 0
    val tied = Seq.fill(6)(("k", 5.0)).toDF("k", "v")
    val t = Stats.quantileBins(tied, "k", "v", nBins = 4).collect()
    assert(t.length == 1 && t.head.getInt(1) == 0 && t.head.getLong(2) == 6L)
  }

  test("shannonEntropy: uniform two-way mix scores 2·round(ln2·1e6/2); single group scores 0") {
    val df = Seq(("k", "u"), ("k", "u"), ("k", "w"), ("k", "w"),
      ("j", "u"), ("j", "u")).toDF("key0", "grp0")
    val out = Stats.shannonEntropy(df, "key0", "grp0").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // per-term round(0.5·ln2·1e6) = 346574, two terms → 693148
    assert(out("k") == ((4L, 2L, 693148L)))
    assert(out("j") == ((2L, 1L, 0L)))
  }

  test("twoProportionZ: hand z to 6dp; degenerate all-failure pool is NULL, never NaN") {
    // A: 2/4, B: 1/4 → p̂=.375, se=√(.375·.625·.5) → z = .25/se = 0.730297
    val units = Seq(("A", 1), ("A", 1), ("A", 0), ("A", 0),
      ("B", 1), ("B", 0), ("B", 0), ("B", 0)).toDF("variant", "s")
    val r = Stats.twoProportionZ(units, "variant", "s").head()
    assert(r.getAs[Double]("z") == 0.730297)
    assert(r.getAs[Int]("significant") == 0)
    val none = Seq(("A", 0), ("B", 0)).toDF("variant", "s")
    val r2 = Stats.twoProportionZ(none, "variant", "s").head()
    assert(r2.isNullAt(r2.fieldIndex("z")) && r2.isNullAt(r2.fieldIndex("significant")))
  }

  test("anovaF: hand-replayed F; zero within-group variance is NULL, never infinite") {
    import spark.implicits._
    // A{0,2}, B{4,6}: A-term round(4/2)=2 + round(100/2)=50 → a=52,
    // b=round(144/4)=36, q=56 → SSB=16, SSW=4 → F=(16/1)/(4/2)=8
    val df = Seq(("A", 0L), ("A", 2L), ("B", 4L), ("B", 6L)).toDF("g", "v")
    val r = Stats.anovaF(df, "g", "v").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 4L, 1L, 2L, 8000000L)))
    // perfectly separated constants: SSW = 0 → NULL (report the
    // degenerate case, don't divide by it)
    val sep = Seq(("A", 0L), ("A", 0L), ("B", 10L), ("B", 10L)).toDF("g", "v")
    val r2 = Stats.anovaF(sep, "g", "v").head()
    assert(r2.isNullAt(4))
  }

  test("cramersVSql: a perfect 2×2 association reads exactly 1.0; 1×C grids are NULL") {
    import spark.implicits._
    val rows = Seq.fill(16)(("a1", "b1")) ++ Seq.fill(16)(("a2", "b2"))
    val r = Stats.chiSquareIndependence(rows.toDF("x", "y"), "x", "y")
      .withColumn("v", expr(Stats.cramersVSql("chi2_micro", "n", "r_levels", "c_levels")))
      .head()
    // χ² = n for a perfect 2×2 → V = √(n/(n·1)) = 1 exactly
    assert(r.getAs[Long]("v") == 1000000L)
    val flat = Seq.fill(8)(("a1", "b1")) ++ Seq.fill(8)(("a1", "b2"))
    val r2 = Stats.chiSquareIndependence(flat.toDF("x", "y"), "x", "y")
      .withColumn("v", expr(Stats.cramersVSql("chi2_micro", "n", "r_levels", "c_levels")))
      .head()
    assert(r2.isNullAt(r2.fieldIndex("v"))) // min(r−1, c−1) = 0
  }

  test("chiResiduals: a perfect diagonal flags all four cells at ±2√2; empty cells carry deficit") {
    import spark.implicits._
    // 16/0/0/16: e = 8 everywhere → resid = ±(256)/√8192 = ±2.828427σ
    val rows = Seq.fill(16)(("a1", "b1")) ++ Seq.fill(16)(("a2", "b2"))
    val out = Stats.chiResiduals(rows.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5), r.getInt(6)))).toMap
    assert(out == Map(
      ("a1", "b1") -> ((16L, 2828427L, 1)),
      ("a1", "b2") -> ((0L, -2828427L, 1)),
      ("a2", "b1") -> ((0L, -2828427L, 1)),
      ("a2", "b2") -> ((16L, 2828427L, 1))))
  }

  private def mwu(rows: (String, Boolean, Long)*): Map[String, (Long, Long, Long, Long, Option[Long])] =
    Stats.mannWhitneyU(rows.toDF("k", "t", "v"), "k", "t", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))))
      .toMap

  test("mannWhitneyU: fully separated arms — hand-replayed 2U and continuity z") {
    // treatment {10,20,30} above control {1,2}: ranks 3,4,5 vs 1,2 →
    // 2·R_a = 24, 2U = 24 − 3·4 = 12 (the n_a·n_b·2 maximum), centered
    // s2 = 6, continuity 5; no ties → var_num = 6·(6·5·4) = 720,
    // var_den = 60 → z = 5/√12·1e6 = 1443376
    val out = mwu(("k", true, 10L), ("k", true, 20L), ("k", true, 30L),
      ("k", false, 1L), ("k", false, 2L))
    assert(out("k") == ((5L, 3L, 2L, 12L, Some(1443376L))))
  }

  test("mannWhitneyU: cross-arm tie gets the integer midrank and the variance correction") {
    // treatment {1,2}, control {2,3}: the tied 2s take midrank 2.5
    // (integer 5 at 2× scale) → 2·R_a = 2+5 = 7, 2U = 7 − 2·3 = 1;
    // s2 = −3 → adj −2; tie group t=2 subtracts 6 from n³−n = 60 →
    // var_num = 2·2·54 = 216, var_den = 36 → z = −2/√6·1e6 = −816497
    val out = mwu(("k", true, 1L), ("k", true, 2L),
      ("k", false, 2L), ("k", false, 3L))
    assert(out("k") == ((4L, 2L, 2L, 1L, Some(-816497L))))
  }

  test("mannWhitneyU: all-tied and one-armed keys report NULL z, never blow up") {
    // all-tied: the tie correction cancels n³−n exactly; one-armed:
    // n_a·n_b = 0 — both degenerate by construction, both must surface
    val out = mwu(("flat", true, 7L), ("flat", false, 7L), ("flat", false, 7L),
      ("solo", true, 1L), ("solo", true, 2L))
    assert(out("flat") == ((3L, 1L, 2L, 2L, None)))
    assert(out("solo") == ((2L, 2L, 0L, 0L, None)))
  }

  test("spearmanCorr: monotone-nonlinear is exactly 1; ties midrank; constant is NULL") {
    // x² is monotone → rank-perfect even though Pearson on values is not
    val mono = Seq(("k", 1L, 1L), ("k", 2L, 4L), ("k", 3L, 9L), ("k", 4L, 16L))
    val r1 = Stats.spearmanCorr(mono.toDF("k", "x", "y"), "k", "x", "y").head()
    assert((r1.getLong(1), r1.getDouble(2)) == ((4L, 1.0)))
    // tied ys {10,10,30}: rank2 (3,3,6) vs x rank2 (2,4,6) → the
    // classic √3/2 = 0.866025 at 6dp
    val tied = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 30L))
    val r2 = Stats.spearmanCorr(tied.toDF("k", "x", "y"), "k", "x", "y").head()
    assert(r2.getDouble(2) == 0.866025)
    val const = Seq(("k", 1L, 5L), ("k", 2L, 5L))
    val r3 = Stats.spearmanCorr(const.toDF("k", "x", "y"), "k", "x", "y").head()
    assert(r3.isNullAt(2))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-moment statistics over metric columns — the feature-selection
  * / data-profiling layer (which metrics co-move, which are redundant).
  *
  * Cross-engine determinism recipe (the e32/olsTrend discipline lifted
  * to second moments): every input is integerized ONCE through a
  * decimal cast (cents, basis points), all 2nd-order moments are then
  * EXACT decimal integer sums — order-immune, no float accumulates —
  * and the only floating arithmetic is the final closed form evaluated
  * in ONE fixed IEEE tree (casts of exact integers, multiplies,
  * subtracts, one divide, one sqrt — every op correctly rounded by
  * IEEE-754, unlike ln/exp), rounded to 6dp at the boundary. Any
  * engine that sums the same integers and evaluates the same tree
  * reproduces the bits.
  */
object Stats {

  /** Multi-consumer internal aggregates (Spark re-plans a DataFrame per
    * consumer — the e39/v22 lesson): without these, ksSliceDrift would
    * scan the corpus three times and chi-square four.
    */
  private val ksHistSlot = new CacheSlot
  private val chiCellSlot = new CacheSlot
  private val abVariantSlot = new CacheSlot

  /** The shared closed-form Pearson SQL for one pair, over moment
    * columns named `n`, `s_<v>`, `s_<a>_<b>`. Public so the oracle
    * builder emits the IDENTICAL expression tree (the determinism
    * contract is "same tree", so there is exactly one definition).
    * Degenerate variance → NULL, never a divide-by-zero NaN.
    */
  def corrSql(sxy: String, sx: String, sy: String, sxx: String, syy: String): String =
    s"""CASE WHEN (CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
                   - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE)) > 0
              AND (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
                   - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)) > 0
         THEN ROUND(
           (CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
            - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
                   - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
                   - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))), 6)
         ELSE CAST(NULL AS DOUBLE) END"""

  /** The shared closed-form cosine over exact integer moments (`dot`,
    * Σa², Σb²) — same one-definition contract as [[corrSql]]: two
    * sqrts, one multiply, one divide, one round, every op correctly
    * rounded by IEEE-754, so any engine replays the bits. Zero-norm
    * sides → NULL, never a divide-by-zero NaN.
    */
  def cosineOfMomentsSql(dot: String, n2a: String, n2b: String): String =
    s"""CASE WHEN CAST($n2a AS DOUBLE) > 0 AND CAST($n2b AS DOUBLE) > 0
         THEN ROUND(CAST($dot AS DOUBLE) /
           (SQRT(CAST($n2a AS DOUBLE)) * SQRT(CAST($n2b AS DOUBLE))), 6)
         ELSE CAST(NULL AS DOUBLE) END"""

  /** Pearson correlation matrix over integer-valued metric columns:
    * one full-scan aggregate collects every 1st/2nd-order moment
    * (map-side partial — the scan is the whole cost), one row out with
    * `corr_<a>_<b>` for each unordered pair.
    *
    * Callers pass PRE-INTEGERIZED columns (cents, basis points…); the
    * cast here to decimal(19,0) makes products exact at any partial-
    * aggregation order. Magnitude contract: Σx·y must stay inside
    * decimal(38) — with 19-digit inputs that is guaranteed by the
    * decimal type algebra, and real metric scales (≤ 1e9 units over
    * ≤ 1e12 rows) sit far inside it.
    *
    * Scale shape: ONE pass, zero shuffles beyond the scalar aggregate's
    * partial merge; k metrics cost k(k+3)/2 sum expressions inside the
    * same codegen stage, not k² passes (the naive `df.stat.corr` pair
    * loop runs one job per pair).
    */
  /** Robust outlier gate: exact median + MAD (median absolute
    * deviation) per key, then count the values beyond `k·MAD` — the
    * outlier detector that a few huge anomalies CANNOT corrupt (mean
    * and stddev both move with the outliers they're supposed to find;
    * median/MAD have a 50% breakdown point — Hampel's rule). Flag
    * counts, not flagged rows, come back: the caller joins the cuts
    * onto the stream if row-level flags are wanted.
    *
    * Exactness: values integerize to cents once; both medians use the
    * engine's exact HISTOGRAM-RANK formulation (the x15 recipe:
    * nearest-rank `r = ⌈n/2⌉ = (5000·n + 9999) div 10000`, value whose
    * cumulative range contains r) — no interpolation, no doubles, so
    * every count replays bit-for-bit. The classical 1.4826 consistency
    * constant is deliberately NOT applied (it is a float; fold it into
    * `k` if normal-consistency is wanted — k=3 here ≈ 2·σ-equivalent).
    *
    * Scale shape (the x15 discipline): rows never enter a window. One
    * map-side-partial (key, value) histogram bounds everything after
    * by DISTINCT CENT VALUES per key; the deviation histogram derives
    * from the value histogram (weights re-aggregate — the raw rows are
    * not rescanned), and both cumulative-rank windows ride the tiny
    * value-level relation. MAD = 0 (over half the values identical)
    * makes every other value an outlier — documented Hampel behavior,
    * not an error.
    *
    * @return one row per key: (key, n, median_cents, mad_cents,
    *         n_outliers, outlier_bp — floored basis points)
    */
  def robustOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      k: Int = 3): DataFrame =
    robustOutliersCents(
      df.select(col(keyCol),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("__cents")),
      keyCol, "__cents", k)

  /** [[robustOutliers]] on an ALREADY-integerized value column — for
    * compositions whose inputs are exact cents (seasonal residuals,
    * pre-aggregated sums) where a dollars round-trip would be noise.
    */
  def robustOutliersCents(
      df: DataFrame,
      keyCol: String,
      centsCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val vc = df
      .select(col(keyCol).as("key"), col(centsCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy("key", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("key").orderBy("v")
    val ranked = vc.withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c") + 1)
    val n = vc.groupBy("key").agg(sum(col("c")).as("n"))
      .withColumn("r", expr("(5000 * n + 9999) div 10000"))
    val med = ranked.join(n, Seq("key"))
      .where(col("lo") <= col("r") && col("r") <= col("hi"))
      .select(col("key"), col("n"), col("r"), col("v").as("median_cents"))
    // deviation histogram from the VALUE histogram — weights carry over
    val dv = vc.join(med.select("key", "median_cents"), Seq("key"))
      .select(col("key"), abs(col("v") - col("median_cents")).as("d"), col("c"))
      .groupBy("key", "d").agg(sum(col("c")).as("c"))
    val wd = Window.partitionBy("key").orderBy("d")
    val mad = dv.withColumn("hi", sum(col("c")).over(wd))
      .withColumn("lo", col("hi") - col("c") + 1)
      .join(n, Seq("key"))
      .where(col("lo") <= col("r") && col("r") <= col("hi"))
      .select(col("key"), col("d").as("mad_cents"))
    vc.join(med.select("key", "n", "median_cents"), Seq("key"))
      .join(mad, Seq("key"))
      .groupBy("key")
      .agg(max(col("n")).as("n"),
        max(col("median_cents")).as("median_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(abs(col("v") - col("median_cents")) >
          lit(k.toLong) * col("mad_cents"), col("c")).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_bp", expr("(10000 * n_outliers) div n"))
  }

  /** Benford's-law expected first-digit frequencies in micro-units:
    * `round(log10(1 + 1/d)·10⁶)` for d = 1..9, HARDCODED — nine
    * constants, so neither engine evaluates a transcendental and the
    * cross-engine contract is literal equality.
    */
  val benfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit conformity per key — the forensic data-quality
    * gate (fabricated, capped, or unit-mangled numeric columns drift
    * from Benford's law long before summary stats notice; Nigrini's
    * audit standard). Emits the full key × digit grid: observed count,
    * observed and expected frequency in micro-units, and the absolute
    * deviation — digits a key never produced surface with n_digit = 0
    * and the full expected mass as deviation (a column stuck above 2
    * MUST flag digit 1, not silently omit it).
    *
    * Exactness: values integerize to cents; the first significant
    * digit comes from the DECIMAL STRING of |cents| (exact in any
    * engine — no log10 float gymnastics), observed frequencies are
    * floored integer micro-units, and the expected table is nine
    * hardcoded constants ([[benfordMicro]]). Zero values drop
    * (Benford applies to positive magnitudes; refunds contribute
    * their magnitude).
    *
    * Scale shape: one (key, digit) map-side-partial aggregate — at
    * most 9 rows per key leave the scan — then the tiny grid join.
    *
    * @return (key, digit, n, n_digit, obs_micro, exp_micro, dev_micro)
    */
  def benfordDeviation(
      df: DataFrame,
      keyCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(keyCol).as("key"),
        abs((col(valueCol).cast("decimal(18,2)") * 100).cast("long")).as("v"))
      .where(col("v") > 0)
    val counts = base
      .withColumn("digit", substring(col("v").cast("string"), 1, 1).cast("int"))
      .groupBy("key", "digit").agg(count(lit(1)).as("n_digit"))
    val totals = counts.groupBy("key").agg(sum(col("n_digit")).as("n"))
    val expected = spark.range(1)
      .select(explode(array(benfordMicro.map { case (d, p) =>
        struct(lit(d).as("digit"), lit(p).as("exp_micro")) }: _*)).as("e"))
      .select(col("e.digit"), col("e.exp_micro"))
    totals.crossJoin(broadcast(expected))
      .join(counts, Seq("key", "digit"), "left")
      .na.fill(0L, Seq("n_digit"))
      .withColumn("obs_micro", expr("(1000000 * n_digit) div n"))
      .withColumn("dev_micro", abs(col("obs_micro") - col("exp_micro")))
      .select("key", "digit", "n", "n_digit", "obs_micro", "exp_micro", "dev_micro")
  }

  /** The shared per-bin PSI term tree: `(p_cur − p_ref)·ln(p_cur/p_ref)`
    * in rounded micro-units, over EXACT integer cross-products
    * (`ra = c_cur'·n_ref'`, `rb = c_ref'·n_cur'`, `den = n_cur'·n_ref'`,
    * so `ra−rb` over `den` IS the share difference and `ra/rb` the share
    * ratio — no intermediate float shares). One definition, emitted
    * verbatim into both engines (the corrSql contract); every op but
    * `LN` is correctly rounded, and a 1-ulp `LN` wobble moves the term
    * only within ~1e-9 of a rounding boundary (the t19 caveat, verified
    * by the oracle at every tested scale).
    */
  def psiTermSql(ra: String, rb: String, den: String): String =
    s"""CAST(ROUND(((CAST($ra AS DOUBLE) - CAST($rb AS DOUBLE))
           / CAST($den AS DOUBLE))
         * LN(CAST($ra AS DOUBLE) / CAST($rb AS DOUBLE)) * 1000000, 0)
         AS BIGINT)"""

  /** Population stability index per key — THE deployment drift gate
    * (scorecard/feature monitoring standard: PSI < 0.1 stable, > 0.25
    * action): how far has each key's value distribution moved between a
    * reference population and the current one?
    *
    * Values integerize to cents and land in fixed-width bins via the
    * positive-mod floor (portable for refunds/negatives); both sides'
    * bin counts take Laplace +1 smoothing over the UNION of observed
    * bins (a bin one side never produced still contributes — that is
    * exactly the drift being measured — and `ln(0)` cannot occur).
    * Per-bin terms are rounded micro-units via [[psiTermSql]] over
    * exact decimal cross-products; the per-key PSI is their exact long
    * sum — order-immune.
    *
    * Scale shape: ONE scan projects (key, side, bin); one map-side-
    * partial (key, bin) aggregate bounds everything after by the bin
    * grid (≤ value-range/width rows per key); totals ride a window over
    * that tiny relation. Nothing touches the driver.
    *
    * @param refPred boolean column marking the reference population
    * @return (key, n_ref, n_cur, n_bins, psi_micro)
    */
  def psi(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      refPred: Column,
      binWidthCents: Long = 2000L): DataFrame = {
    require(binWidthCents >= 1, s"bin width must be >= 1 cent, got $binWidthCents")
    import org.apache.spark.sql.expressions.Window
    val w = binWidthCents
    val base = df.select(col(keyCol).as("key"),
        refPred.cast("int").as("is_ref"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("cents").isNotNull)
      .withColumn("bin", expr(s"(cents - ((cents % $w + $w) % $w)) div $w"))
    val cells = base.groupBy("key", "bin")
      .agg(sum(col("is_ref")).as("c_ref"),
        sum(lit(1) - col("is_ref")).as("c_cur"))
    val wk = Window.partitionBy("key")
    cells
      .withColumn("n_ref", sum(col("c_ref")).over(wk))
      .withColumn("n_cur", sum(col("c_cur")).over(wk))
      .withColumn("n_bins", count(lit(1)).over(wk))
      // smoothed cross-products as exact decimals (counts ≤ 1e18)
      .withColumn("ra", (col("c_cur") + 1).cast("decimal(18,0)") *
        (col("n_ref") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("rb", (col("c_ref") + 1).cast("decimal(18,0)") *
        (col("n_cur") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("den", (col("n_cur") + col("n_bins")).cast("decimal(18,0)") *
        (col("n_ref") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("term", expr(psiTermSql("ra", "rb", "den")))
      .groupBy("key")
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        max(col("n_bins")).as("n_bins"), sum(col("term")).as("psi_micro"))
  }

  /** PSI per-bin drill-down — WHICH value range drifted (the x54
    * stance applied to x39): the same smoothed cross-product terms as
    * [[psi]], emitted per (key, bin) with the reference/current share
    * difference in signed basis points (`10⁴·(ra − rb) div den` —
    * positive = the bin GREW). Same one-scan histogram; ≤ bins rows
    * per key leave it.
    *
    * @return (key, bin — lower edge in binWidth units, c_ref, c_cur,
    *         term_micro, share_delta_bp)
    */
  def psiBins(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      refPred: Column,
      binWidthCents: Long = 2000L): DataFrame = {
    require(binWidthCents >= 1, s"bin width must be >= 1 cent, got $binWidthCents")
    import org.apache.spark.sql.expressions.Window
    val w = binWidthCents
    val base = df.select(col(keyCol).as("key"),
        refPred.cast("int").as("is_ref"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .where(col("cents").isNotNull)
      .withColumn("bin", expr(s"(cents - ((cents % $w + $w) % $w)) div $w"))
    val cells = base.groupBy("key", "bin")
      .agg(sum(col("is_ref")).as("c_ref"),
        sum(lit(1) - col("is_ref")).as("c_cur"))
    val wk = Window.partitionBy("key")
    cells
      .withColumn("n_ref", sum(col("c_ref")).over(wk))
      .withColumn("n_cur", sum(col("c_cur")).over(wk))
      .withColumn("n_bins", count(lit(1)).over(wk))
      .withColumn("ra", (col("c_cur") + 1).cast("decimal(18,0)") *
        (col("n_ref") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("rb", (col("c_ref") + 1).cast("decimal(18,0)") *
        (col("n_cur") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("den", (col("n_cur") + col("n_bins")).cast("decimal(18,0)") *
        (col("n_ref") + col("n_bins")).cast("decimal(18,0)"))
      .withColumn("term_micro", expr(psiTermSql("ra", "rb", "den")))
      // signed share delta: (cur share − ref share) in floored bp via
      // the SAME exact cross-products; positive-mod floor (deltas go
      // negative)
      .withColumn("share_delta_bp", expr(
        """CAST((10000 * (ra - rb)
             - (((10000 * (ra - rb)) % den + den) % den)) div den AS BIGINT)"""))
      .select("key", "bin", "c_ref", "c_cur", "term_micro", "share_delta_bp")
  }

  /** The shared chi-square cell term: `(o·N − r·c)²/(N·r·c)` — which IS
    * `(o−e)²/e` with `e = r·c/N` — in rounded micro-units, every input
    * an exact integer and every op (multiply, subtract, divide, round)
    * correctly rounded IEEE-754: unlike the ln-bearing trees this one
    * is bit-portable with NO transcendental caveat. Magnitude contract:
    * counts < 2⁵³ cast to double exactly.
    */
  def chiTermSql(o: String, n: String, rt: String, ct: String): String =
    s"""CAST(ROUND(
         (CAST($o AS DOUBLE) * CAST($n AS DOUBLE)
           - CAST($rt AS DOUBLE) * CAST($ct AS DOUBLE))
         * (CAST($o AS DOUBLE) * CAST($n AS DOUBLE)
           - CAST($rt AS DOUBLE) * CAST($ct AS DOUBLE))
         / (CAST($n AS DOUBLE) * CAST($rt AS DOUBLE) * CAST($ct AS DOUBLE))
         * 1000000, 0) AS BIGINT)"""

  /** Chi-square test of independence between two categorical columns —
    * the DQ gate for "did the label mix shift with the source?" /
    * "is this attribute independent of that one?". The statistic runs
    * over the FULL R×C grid (a cell the data never produced still
    * carries its expected mass — the Benford grid discipline; dropping
    * empty cells understates the statistic), each cell a rounded
    * micro-unit term via [[chiTermSql]], summed as exact longs.
    *
    * Scale shape: one (a, b) map-side-partial aggregate — at most R×C
    * rows leave the scan — then grid assembly over the two tiny
    * marginal relations. The statistic compares against a chi-square
    * quantile OUT OF BAND (quantiles are caller policy; df is emitted).
    *
    * @return one row: (n, r_levels, c_levels, dof, chi2_micro)
    */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chiCellSlot.persist(
      df.select(col(aCol).as("a"), col(bCol).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("o")))
    val rt = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    rt.crossJoin(ct)
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("term", expr(chiTermSql("o", "n", "rt", "ct")))
      .agg(max(col("n")).as("n"),
        countDistinct(col("a")).as("r_levels"),
        countDistinct(col("b")).as("c_levels"),
        sum(col("term")).as("chi2_micro"))
      .withColumn("dof", (col("r_levels") - 1) * (col("c_levels") - 1))
      .select("n", "r_levels", "c_levels", "dof", "chi2_micro")
  }

  /** The shared standardized-residual tree: `(o − e)/√e` with
    * `e = rt·ct/n`, algebraically `(o·n − rt·ct)/√(n·rt·ct)` — exact
    * integer cross-products cast once, one subtract, one sqrt, one
    * divide, rounded micro-units. The per-cell companion to
    * [[chiTermSql]] (that tree is this one squared).
    */
  def chiResidualSql(o: String, n: String, rt: String, ct: String): String =
    s"""CAST(ROUND(
         (CAST($o AS DOUBLE) * CAST($n AS DOUBLE)
           - CAST($rt AS DOUBLE) * CAST($ct AS DOUBLE))
         / SQRT(CAST($n AS DOUBLE) * CAST($rt AS DOUBLE) * CAST($ct AS DOUBLE))
         * 1000000, 0) AS BIGINT)"""

  /** One-way ANOVA's per-group term `round(S_g²/n_g)` — a deterministic
    * rounded unit per group (the micro-nat recipe applied to the
    * between-group sum of squares), so the group sum is an order-immune
    * exact long.
    */
  def anovaGroupTermSql(s: String, n: String): String =
    s"""CAST(ROUND(CAST($s AS DOUBLE) * CAST($s AS DOUBLE)
         / CAST($n AS DOUBLE), 0) AS BIGINT)"""

  /** The shared one-way F tree over exact integers: `F = (SSB/(k−1)) /
    * (SSW/(n−k))` with SSB = A − B (rounding can push a null-effect SSB
    * a hair negative — clamped at 0) and SSW = Q − A. Degenerate cases
    * (one group, n ≤ k, zero within-group variance) → NULL.
    */
  def anovaFSql(a: String, b: String, q: String, n: String, k: String): String =
    s"""CASE WHEN $k > 1 AND $n > $k AND ($q - $a) > 0 THEN
         CAST(ROUND(CAST(GREATEST($a - $b, 0) AS DOUBLE)
           * CAST($n - $k AS DOUBLE)
           / (CAST($q - $a AS DOUBLE) * CAST($k - 1 AS DOUBLE))
           * 1000000, 0) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END"""

  /** One-way ANOVA across groups — "do the group MEANS differ?", the
    * k-group generalization of e45/e52's two-sample questions. Inputs
    * integerize once (cents); per-group sums and the global Σx² are
    * exact decimals; the only non-exact steps are the per-group rounded
    * units ([[anovaGroupTermSql]], ≤0.5 absolute error each — noise at
    * monitoring scale) and the single final [[anovaFSql]] tree, so the
    * micro-unit F replays bit-for-bit. Compare against an F quantile
    * out of band (dfb/dfw are emitted).
    *
    * Scale shape: one (group) map-side-partial aggregate — the scan is
    * the whole cost — then arithmetic on the groups-sized relation.
    *
    * @return one row: (k_groups, n, dfb, dfw, f_micro)
    */
  def anovaF(df: DataFrame, groupCol: String, centsCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(centsCol).cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy("g")
      .agg(count(lit(1)).as("n_g"),
        sum(col("v").cast("decimal(38,0)")).as("s_g"),
        sum(col("v").cast("decimal(19,0)") * col("v")).as("q_g"))
    g.agg(count(lit(1)).as("k_groups"),
        sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"),
        sum(col("q_g")).as("q"),
        sum(expr(anovaGroupTermSql("s_g", "n_g"))).as("a"))
      .withColumn("b", expr(anovaGroupTermSql("s", "n")))
      .withColumn("dfb", col("k_groups") - 1)
      .withColumn("dfw", col("n") - col("k_groups"))
      .withColumn("f_micro", expr(anovaFSql("a", "b", "q", "n", "k_groups")))
      .select("k_groups", "n", "dfb", "dfw", "f_micro")
  }

  /** The shared Cramér's V tree: `V = √(χ²/(n·min(r−1, c−1)))` over the
    * exact micro-unit χ² and integer counts — effect SIZE, the
    * sample-size-free companion to x40's statistic (a huge n makes any
    * trivial dependence "significant"; V says whether it matters).
    * Rounded micro-units; degenerate 1×C / R×1 grids → NULL.
    */
  def cramersVSql(chi2Micro: String, n: String, r: String, c: String): String =
    s"""CASE WHEN LEAST($r - 1, $c - 1) > 0 THEN
         CAST(ROUND(SQRT((CAST($chi2Micro AS DOUBLE) / 1000000.0)
           / (CAST($n AS DOUBLE) * CAST(LEAST($r - 1, $c - 1) AS DOUBLE)))
           * 1000000, 0) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END"""

  /** Per-cell standardized residuals of the independence model — the
    * DRILL-DOWN x40's one-number verdict can't give: WHICH (a, b) cells
    * are over/under-represented, and by how many standard deviations.
    * Same full R×C grid (an empty cell's deficit is exactly the point),
    * same slot-cached cell aggregate as [[chiSquareIndependence]] (the
    * two queries share one scan when run together). |resid| > 2 (micro
    * 2e6) flags the conventional 2σ cells.
    *
    * @return one row per grid cell: (a, b, o, rt, ct, resid_micro,
    *         flagged)
    */
  def chiResiduals(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chiCellSlot.persist(
      df.select(col(aCol).as("a"), col(bCol).as("b"))
        .where(col("a").isNotNull && col("b").isNotNull)
        .groupBy("a", "b").agg(count(lit(1)).as("o")))
    val rt = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    rt.crossJoin(ct)
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("resid_micro", expr(chiResidualSql("o", "n", "rt", "ct")))
      .withColumn("flagged", (abs(col("resid_micro")) > 2000000L).cast("int"))
      .select("a", "b", "o", "rt", "ct", "resid_micro", "flagged")
  }

  /** Gini concentration per key — revenue/value inequality (how much of
    * a nation's revenue do its top customers hold?), plus the top-decile
    * share, from ONE value histogram. The classic rank formulation
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` (x ascending, i = 1..n)
    * needs rank-weighted sums — but a run of `c` tied values at
    * cumulative range [lo, hi] contributes `x·(lo+hi)·c/2` exactly
    * (consecutive-integer sum), so the whole statistic derives from the
    * (key, value) histogram: rows NEVER enter a window (the x15 scale
    * shape). All terms are exact decimals; output is floored basis
    * points (values must be ≥ 0 — enforced — so truncation IS floor).
    *
    * Top-decile share: the top ⌈n/10⌉ units' value share, from the same
    * cumulative ranks — a run straddling the cut contributes only its
    * ranks above `n−k`.
    *
    * @param df pre-aggregated: one row per unit (e.g. per customer)
    * @return (key, n, sum_cents, gini_bp, top_decile_n, top_decile_bp)
    */
  def giniConcentration(
      df: DataFrame,
      keyCol: String,
      valueCentsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = df.select(col(keyCol).as("key"), col(valueCentsCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("v") >= 0)
      .groupBy("key", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("key").orderBy("v")
    val wk = Window.partitionBy("key")
    vc.withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(wk))
      .withColumn("s", sum(col("v").cast("decimal(20,0)") * col("c")).over(wk))
      .withColumn("k", expr("(n + 9) div 10"))
      // 2·Σ i·xᵢ for the run = v·(lo+hi)·c — exact (consecutive-int sum)
      .withColumn("num2", col("v").cast("decimal(38,0)") *
        (col("lo") + col("hi")).cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
      .withColumn("top_cnt",
        greatest(lit(0L), col("hi") - greatest(col("n") - col("k"), col("lo") - 1)))
      .withColumn("top_sum", col("v").cast("decimal(38,0)") * col("top_cnt"))
      .groupBy("key")
      .agg(max(col("n")).as("n"), max(col("s")).as("s"), max(col("k")).as("top_decile_n"),
        sum(col("num2")).as("num2"), sum(col("top_sum")).as("top_sum"))
      .where(col("s") > 0)
      .withColumn("gini_bp",
        expr("CAST((10000 * (num2 - (n + 1) * s)) div (n * s) AS BIGINT)"))
      .withColumn("top_decile_bp", expr("CAST((10000 * top_sum) div s AS BIGINT)"))
      .select(col("key"), col("n"), col("s").cast("long").as("sum_cents"),
        col("gini_bp"), col("top_decile_n"), col("top_decile_bp"))
  }

  /** Two-sample Kolmogorov–Smirnov distance of every key's value
    * distribution against the REST of the corpus — the per-slice drift
    * gate ("which source's quality-score distribution deviates most?").
    * `D = max_v |F_key(v) − F_rest(v)|` is computed ENTIRELY in
    * integers: the max of `|cum_key·n_rest − cum_rest·n_key|` over the
    * merged value grid, reported as floored basis points of `n_key·
    * n_rest` — no floats anywhere, bit-portable with no caveats at all.
    *
    * Scale shape: one (key, value) map-side-partial histogram; the
    * complement histogram derives from the value-level re-aggregation
    * (the corpus is NOT rescanned per key); the cumulative windows ride
    * the keys × distinct-values grid — bounded by the value range at
    * cent granularity, not the row count. Ties in the max resolve to
    * the smallest value (struct-max argmax), so the report is unique.
    *
    * @return (key, n_key, n_rest, ks_bp, at_cents)
    */
  def ksSliceDrift(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ck = ksHistSlot.persist(
      df.select(col(keyCol).as("key"),
          (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("v"))
        .where(col("v").isNotNull)
        .groupBy("key", "v").agg(count(lit(1)).as("c")))
    val call = ck.groupBy("v").agg(sum(col("c")).as("c_all"))
    val keys = ck.select("key").distinct()
    val grid = keys.crossJoin(call)
      .join(ck, Seq("key", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("c_rest", col("c_all") - col("c"))
    val w = Window.partitionBy("key").orderBy("v")
    val wk = Window.partitionBy("key")
    grid
      .withColumn("cum_k", sum(col("c")).over(w))
      .withColumn("cum_r", sum(col("c_rest")).over(w))
      .withColumn("n_key", sum(col("c")).over(wk))
      .withColumn("n_rest", sum(col("c_rest")).over(wk))
      .where(col("n_key") > 0 && col("n_rest") > 0)
      .withColumn("diff",
        abs(col("cum_k").cast("decimal(20,0)") * col("n_rest")
          - col("cum_r").cast("decimal(20,0)") * col("n_key")))
      .groupBy("key")
      .agg(max(col("n_key")).as("n_key"), max(col("n_rest")).as("n_rest"),
        max(struct(col("diff"), (-col("v")).as("nv"))).as("arg"))
      .withColumn("ks_bp",
        expr("CAST((10000 * arg.diff) div (CAST(n_key AS DECIMAL(20,0)) * n_rest) AS BIGINT)"))
      .select(col("key"), col("n_key"), col("n_rest"), col("ks_bp"),
        (-col("arg.nv")).as("at_cents"))
  }

  private val binsHistSlot = new CacheSlot

  /** Quantile binning — the feature-discretization prep step (equal-
    * frequency bins for scorecards, monotone-binned features, stratified
    * debugging): per key, cut values at exact nearest-rank quantiles
    * `r_i = ⌈i·n/nBins⌉` and count the rows per bin. A value equal to a
    * cut lands in the LOWER bin (`≤` comparison — deterministic in both
    * engines); heavy ties can therefore make bins uneven, which is the
    * honest answer for discrete data (an equal-frequency guarantee on
    * tied data is a lie).
    *
    * Scale shape: the x15 histogram discipline end-to-end — one
    * (key, value) map-side-partial aggregate (slot-cached: the ranked
    * cuts AND the bin counts both derive from it), cumulative windows
    * on the tiny value-level relation, bin counts re-aggregate the
    * HISTOGRAM weights. Rows never enter a window and are never
    * rescanned.
    *
    * @return (key, bin, n_bin, cut_hi) — bin 0..nBins−1; `cut_hi` is
    *         the bin's inclusive upper cut in cents (NULL for the last)
    */
  def quantileBins(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      nBins: Int = 4): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val vc = binsHistSlot.persist(
      df.select(col(keyCol).as("key"),
          (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("v"))
        .where(col("v").isNotNull)
        .groupBy("key", "v").agg(count(lit(1)).as("c")))
    val w = Window.partitionBy("key").orderBy("v")
    val ranked = vc.withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c") + 1)
      .withColumn("n", sum(col("c")).over(Window.partitionBy("key")))
    val cutCols = (1 until nBins).map { i =>
      max(when(expr(s"($i * n + $nBins - 1) div $nBins").between(col("lo"), col("hi")),
        col("v"))).as(s"cut_$i")
    }
    val cuts = ranked.groupBy("key").agg(cutCols.head, cutCols.tail: _*)
    val binExpr = (1 until nBins).foldLeft(lit(0)) { (acc, i) =>
      acc + (col("v") > col(s"cut_$i")).cast("int")
    }
    vc.join(cuts, Seq("key"))
      .withColumn("bin", binExpr)
      .withColumn("cut_hi",
        (1 until nBins).foldLeft(lit(null).cast("long")) { (acc, i) =>
          when(col("bin") === i - 1, col(s"cut_$i")).otherwise(acc)
        })
      .groupBy("key", "bin")
      .agg(sum(col("c")).as("n_bin"), max(col("cut_hi")).as("cut_hi"))
  }

  /** Weighted percentiles per key — "the value below which half the
    * REVENUE sits", not half the rows (the unweighted median of order
    * values answers a different question than the value splitting
    * revenue in half; capacity planning, fairness reports, and spend
    * concentration all want the weighted one). Same x15 histogram-rank
    * discipline with the rank running over CUMULATIVE WEIGHT:
    * `r_p = ⌈p·W⌉`, answer = the value whose cumulative-weight range
    * contains r_p. All integer; rows never enter a window (the
    * value-level histogram carries summed weights).
    *
    * Non-positive weights are excluded (a zero-weight observation
    * cannot locate a weighted rank; negative weights have no
    * percentile semantics — refunds belong in the VALUE, not the
    * weight).
    *
    * @return (key, n_values, total_weight, wp50, wp90) — wp* in the
    *         value column's units
    */
  def weightedPercentiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = df.select(col(keyCol).as("key"), col(valueCol).cast("long").as("v"),
        col(weightCol).cast("decimal(20,0)").as("w"))
      .where(col("v").isNotNull && col("w").isNotNull && col("w") > 0)
      .groupBy("key", "v").agg(sum(col("w")).as("w"))
    val win = Window.partitionBy("key").orderBy("v")
    vc.withColumn("hi", sum(col("w")).over(win))
      .withColumn("lo", col("hi") - col("w") + 1)
      .withColumn("tw", sum(col("w")).over(Window.partitionBy("key")))
      .groupBy("key")
      .agg(count(lit(1)).as("n_values"),
        max(col("tw")).cast("long").as("total_weight"),
        max(when(expr("(5000 * tw + 9999) div 10000").between(col("lo"), col("hi")),
          col("v"))).as("wp50"),
        max(when(expr("(9000 * tw + 9999) div 10000").between(col("lo"), col("hi")),
          col("v"))).as("wp90"))
  }

  /** 2-D Pareto skyline (Börzsönyi, Kossmann & Stocker 2001) — the
    * maximization frontier: rows no other row beats on BOTH metrics
    * (strict on at least one). The "best trade-off set" query —
    * spend-vs-recency customer tiers, quality-vs-length document
    * cuts — that a plain ORDER BY cannot express.
    *
    * Shape: collapse to the distinct-(x,y) HISTOGRAM first (two hash
    * aggregates, fully parallel — same-x rows below that x's max y are
    * dominated by definition and never reach the frontier pass), then a
    * BUCKET-PARTITIONED two-pass suffix max over the per-x maxima: a
    * candidate survives iff max(y) over strictly-greater x is NULL or
    * < its y, and that suffix max decomposes exactly as
    * greatest(within-bucket suffix max, max y of all HIGHER buckets).
    * Pass 1 runs the strict RANGE (1 FOLLOWING, UNBOUNDED) frame inside
    * each [[uniformBuckets]] bucket (bucket id is a monotone function
    * of x, so equal x never straddle and "higher bucket" ⇒ "strictly
    * greater x" — the frame stays exact); pass 2 is a buckets-sized
    * suffix max over the per-bucket maxima (≤
    * `spark.sql.shuffle.partitions` rows — config-bounded, the ONLY
    * unpartitioned window here), broadcast back. Candidates never
    * funnel through one task: the old single unpartitioned window
    * sorted ~|distinct x| rows in ONE partition — for an
    * effectively-unique x (per-customer spend in cents) that is a
    * straggler-to-OOM serial plan at 10⁸ customers. Ties on both
    * metrics are mutually non-dominating: the pair stays, with its row
    * count.
    *
    * @return (x, y, n_points) — the frontier pairs under the caller's
    *         column names via the usual rename, n_points = rows at
    *         that exact pair
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .groupBy("x", "y").agg(count(lit(1)).as("n_points"))
    val mx = g.groupBy("x").agg(max(col("y")).as("y"))
    val cand = mx.join(g, Seq("x", "y"))
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parts = uniformBuckets(cand, "x", par)
    // pass 1: exact strict suffix max WITHIN each bucket
    val wIn = Window.partitionBy("pid").orderBy("x")
      .rangeBetween(1L, Window.unboundedFollowing)
    val local = parts.withColumn("my_in", max(col("y")).over(wIn))
    // pass 2: suffix max ACROSS buckets — one row per non-empty bucket,
    // the config-bounded relation the x15 argument allows
    val hi = parts.groupBy("pid").agg(max(col("y")).as("py"))
      .withColumn("my_hi", max(col("py")).over(
        Window.orderBy("pid").rowsBetween(1L, Window.unboundedFollowing)))
      .select("pid", "my_hi")
    local.join(broadcast(hi), Seq("pid"))
      // greatest() skips NULLs: NULL only when no strictly-greater x
      // exists anywhere — the global frontier's right edge
      .withColumn("my", greatest(col("my_in"), col("my_hi")))
      .where(col("my").isNull || col("my") < col("y"))
      .select("x", "y", "n_points")
  }

  /** Order-immune uniform bucketing of a LONG order column — the shared
    * primitive that turns an unpartitioned running-agg window into a
    * partitioned two-pass plan (the x47 skyline fix, reused by every
    * cumulative-histogram consumer). Adds `pid` ∈ [0, nBuckets):
    * `((v − min) · nBuckets) div (max − min + 1)` over a broadcast
    * one-row min/max scalar. Properties the two-pass decompositions
    * rely on: pid is a MONOTONE function of the value (higher bucket ⇒
    * strictly greater values — equal values can never straddle), and it
    * is DETERMINISTIC without caching (min/max are order-free
    * aggregates, so plan branches that recompute the scalar get
    * identical bucket ids — no persist, no pid-consistency hazard; a
    * sampled repartitionByRange would need a cache pin for exactly that
    * reason). Decimal arithmetic keeps the product exact for any long
    * span. Skewed value distributions give imbalanced buckets — never
    * wrong answers, and never worse than the one-task plan this
    * replaces.
    */
  def uniformBuckets(df: DataFrame, orderCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val mm = df.agg(min(col(orderCol)).cast("decimal(38,0)").as("_bmin"),
      max(col(orderCol)).cast("decimal(38,0)").as("_bmax"))
    df.crossJoin(broadcast(mm))
      .withColumn("pid", expr(
        s"CAST(((CAST($orderCol AS DECIMAL(38,0)) - _bmin) * $nBuckets) " +
          s"div (_bmax - _bmin + 1) AS INT)"))
      .drop("_bmin", "_bmax")
  }

  /** Parallel prefix sum over a DISTINCT-keyed relation (a histogram):
    * `cumCol = Σ value over rows with orderCol ≤ this row's` without an
    * unpartitioned window. Pass 1 sums within each uniform bucket
    * (partitioned window); pass 2 adds the lower buckets' totals — a
    * nBuckets-sized relation (config-bounded, the only unpartitioned
    * window) broadcast back. Requires orderCol values DISTINCT (the
    * histogram contract — ROWS and RANGE frames then agree).
    */
  private[ops] def cumSumParallel(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      cumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val par = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val parts = uniformBuckets(df, orderCol, par)
    val wIn = Window.partitionBy("pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lower = parts.groupBy("pid").agg(sum(col(valueCol)).cast("long").as("_pt"))
      .withColumn("_lo", coalesce(sum(col("_pt")).over(
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("_lo"))
    parts
      .withColumn("_loc", sum(col(valueCol)).over(wIn).cast("long"))
      .join(broadcast(lower), Seq("pid"))
      .withColumn(cumCol, col("_loc") + col("_lo"))
      .drop("pid", "_loc", "_lo")
  }

  private val tClsSlot = new CacheSlot

  /** t-closeness — the third leg of the privacy triad (k-anonymity
    * bounds group SIZE, l-diversity bounds distinct sensitive VALUES;
    * neither stops a group whose sensitive DISTRIBUTION is skewed far
    * from the corpus — 90% one diagnosis in a group is a disclosure
    * even with l = 3). For a categorical sensitive attribute the
    * distance is total variation: `t = ½·Σ_levels |p_g − p_corpus|`,
    * here in floored basis points over exact integer cross-products
    * (`|c_g·N − c_all·n_g|` summed, divided by `2·n_g·N`) — no floats.
    * The grid includes levels a group never produced (their corpus
    * mass counts — the Benford/chi-square grid discipline).
    *
    * Scale shape: one (qi, sensitive) map-side-partial aggregate
    * (slot-cached — groups, levels, and the grid all derive from it);
    * everything after is sized by groups × levels.
    *
    * @return (qi..., group_size, t_bp, t_ok)
    */
  def tCloseness(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      maxTbp: Long = 2000L): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = qiCols.map(col)
    val gc = tClsSlot.persist(
      df.select(qi :+ col(sensitiveCol).as("sens"): _*)
        .where(col("sens").isNotNull)
        .groupBy(qi :+ col("sens"): _*).agg(count(lit(1)).as("c")))
    val groups = gc.groupBy(qi: _*).agg(sum(col("c")).as("n_g"))
    val levels = gc.groupBy("sens").agg(sum(col("c")).as("c_all"))
    val tot = levels.agg(sum(col("c_all")).as("n_all"))
    groups.crossJoin(broadcast(levels))
      .join(gc, qiCols :+ "sens", "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("d",
        abs(col("c").cast("decimal(20,0)") * col("n_all")
          - col("c_all").cast("decimal(20,0)") * col("n_g")))
      .groupBy(qi: _*)
      .agg(max(col("n_g")).as("group_size"), max(col("n_all")).as("n_all"),
        sum(col("d")).as("dsum"))
      .withColumn("t_bp",
        expr("CAST((10000 * dsum) div (2 * CAST(group_size AS DECIMAL(20,0)) * n_all) AS BIGINT)"))
      .withColumn("t_ok", (col("t_bp") <= maxTbp).cast("int"))
      .drop("dsum", "n_all")
  }

  /** The shared Shannon entropy term tree: `−p·ln(p) = (c/n)·ln(n/c)`
    * in rounded micro-nats over exact integer counts (one divide, one
    * ln, one multiply, one round — the t19 recipe with its 1-ulp ln
    * caveat). `c = n` (a single group) gives `ln(1) = 0` exactly.
    */
  def entropyTermSql(c: String, n: String): String =
    s"""CAST(ROUND((CAST($c AS DOUBLE) / CAST($n AS DOUBLE))
         * LN(CAST($n AS DOUBLE) / CAST($c AS DOUBLE)) * 1000000, 0)
         AS BIGINT)"""

  /** The shared log-ratio quantizer: `round(1e6·ln(num/den))` over
    * exact integer operands (two correctly-rounded casts, one divide,
    * one ln with the t19 1-ulp caveat, one round) — the per-token term
    * of KL/JSD-style divergences. Callers multiply by an integer count
    * and sum, so totals are order-immune integers.
    */
  def lnRatioMicroSql(num: String, den: String, scale: Long = 1000000L): String =
    s"""CAST(ROUND(LN(CAST($num AS DOUBLE) / CAST($den AS DOUBLE))
         * $scale, 0) AS BIGINT)"""

  /** Shannon entropy of a categorical mix per key — the diversity gate
    * (is a language's source mix collapsing to one crawl? is a shard's
    * label mix degenerate?). `H = Σ (c/n)·ln(n/c)` in micro-nats: 0 for
    * a single group, `ln(k)·1e6` for a uniform k-way mix — compare
    * against `ln(k)` out of band for evenness. Terms quantize via
    * [[entropyTermSql]] and sum as exact longs (order-immune).
    *
    * Scale shape: one (key, group) map-side-partial aggregate — the
    * only pass over the data — then a key-grain rollup of the tiny
    * group-count relation.
    *
    * @return (key, n, n_groups, entropy_micro)
    */
  def shannonEntropy(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(col(keyCol).as("key"), col(groupCol).as("grp"))
      .where(col("grp").isNotNull)
      .groupBy("key", "grp").agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy("key")))
      .withColumn("term", expr(entropyTermSql("c", "n")))
      .groupBy("key")
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_groups"),
        sum(col("term")).as("entropy_micro"))
  }

  /** The shared two-proportion z statistic tree: pooled-variance
    * `z = (x₁/n₁ − x₂/n₂) / √(p̂(1−p̂)(1/n₁+1/n₂))` with
    * `p̂ = (x₁+x₂)/(n₁+n₂)`, every input an exact integer, every op
    * correctly rounded IEEE-754 (divides, subtracts, multiplies, one
    * sqrt — no transcendental caveat), rounded to 6dp at the boundary.
    * Degenerate pools (no successes, or all successes) → NULL.
    */
  def zTestSql(x1: String, n1: String, x2: String, n2: String): String =
    s"""CASE WHEN ($x1 + $x2) = 0 OR ($x1 + $x2) = ($n1 + $n2)
           OR $n1 = 0 OR $n2 = 0 THEN CAST(NULL AS DOUBLE)
         ELSE ROUND(
           (CAST($x1 AS DOUBLE) / CAST($n1 AS DOUBLE)
             - CAST($x2 AS DOUBLE) / CAST($n2 AS DOUBLE))
           / SQRT(
             ((CAST($x1 AS DOUBLE) + CAST($x2 AS DOUBLE))
               / (CAST($n1 AS DOUBLE) + CAST($n2 AS DOUBLE)))
             * (1 - (CAST($x1 AS DOUBLE) + CAST($x2 AS DOUBLE))
               / (CAST($n1 AS DOUBLE) + CAST($n2 AS DOUBLE)))
             * (1 / CAST($n1 AS DOUBLE) + 1 / CAST($n2 AS DOUBLE))), 6)
         END"""

  /** Two-proportion z-test over unit-level outcomes — the A/B
    * experiment readout (did variant B's conversion rate move?). Input
    * is one row per unit with a variant label and a 0/1 success flag;
    * output is one row per variant PAIR (a < b lexicographically) with
    * exact counts and the 6dp z via [[zTestSql]], plus the |z| ≥ 1.96
    * flag (the two-sided 5% line — compared AFTER rounding, so the
    * flag replays deterministically).
    *
    * Scale shape: one variant-level aggregate (variants-sized), then a
    * tiny self-join over the variant pairs. The unit-level input is the
    * caller's one scan.
    */
  def twoProportionZ(
      units: DataFrame,
      variantCol: String,
      successCol: String): DataFrame = {
    val v = abVariantSlot.persist(
      units.select(col(variantCol).as("variant"),
          col(successCol).cast("long").as("s"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum(col("s")).as("x")))
    val a = v.select(col("variant").as("variant_a"), col("n").as("n_a"), col("x").as("x_a"))
    val b = v.select(col("variant").as("variant_b"), col("n").as("n_b"), col("x").as("x_b"))
    a.join(b, col("variant_a") < col("variant_b"))
      .withColumn("z", expr(zTestSql("x_a", "n_a", "x_b", "n_b")))
      .withColumn("significant",
        when(col("z").isNull, lit(null).cast("int"))
          .otherwise((abs(col("z")) >= 1.959964).cast("int")))
  }

  def corrMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, "need at least two metric columns")
    require(vars.map(_._1).distinct.size == vars.size, "metric names must be unique")
    val base = df.select(vars.map { case (n, c) => c.cast("decimal(19,0)").as(n) }: _*)
    val moments: Seq[Column] =
      vars.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
        (for {
          i <- vars.indices
          j <- i until vars.size
        } yield {
          val (a, b) = (vars(i)._1, vars(j)._1)
          sum(col(a) * col(b)).as(s"s_${a}_${b}")
        })
    val m = base.agg(count(lit(1)).as("n"), moments: _*)
    val corrs = for {
      i <- vars.indices
      j <- i + 1 until vars.size
    } yield {
      val (a, b) = (vars(i)._1, vars(j)._1)
      expr(corrSql(s"s_${a}_${b}", s"s_$a", s"s_$b", s"s_${a}_${a}", s"s_${b}_${b}"))
        .as(s"corr_${a}_${b}")
    }
    m.select(col("n").cast("long").as("n_rows") +: corrs: _*)
  }

  /** The shared rank-test z tree: `z = s_adj / √(num/den)` in floored-
    * none, ROUNDED micro-units — one exact cast each for the integer
    * numerator/denominator (decimal casts to double are correctly
    * rounded, the x35 contract), one divide, one sqrt, one divide, one
    * round. Zero variance (`num ≤ 0`) → NULL, never a NaN. Shared
    * verbatim by [[mannWhitneyU]] and its oracle (and by e51's
    * Mann–Kendall via the var18/18 specialization in TimeSeries).
    */
  def rankZSql(sAdj: String, varNum: String, varDen: String): String =
    s"""CASE WHEN CAST($varNum AS DOUBLE) > 0 THEN
         CAST(ROUND(CAST($sAdj AS DOUBLE) /
           SQRT(CAST($varNum AS DOUBLE) / CAST($varDen AS DOUBLE)) *
           1000000) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END"""

  /** Mann–Whitney U (Wilcoxon rank-sum) test per key — the
    * DISTRIBUTION-level A/B readout [[twoProportionZ]] cannot give: a
    * treatment that shifts the whole value distribution (session
    * depth, latency, spend) moves U even when means are dragged by
    * outliers in both arms (ranks are magnitude-blind — the e51
    * robustness argument applied to two-sample comparison).
    *
    * Exactness: ranks are exact MIDRANKS kept at 2× scale so ties stay
    * integer (a tied run [lo, hi] contributes `lo + hi` per member —
    * twice the average rank, never a .5); the doubled rank sum, 2U, and
    * the centered statistic `s2 = 2U − n_a·n_b` are pure integers. The
    * tie-corrected variance enters as one integer ratio:
    * `Var(2U) = n_a·n_b·[(n+1)n(n−1) − Σt(t−1)(t+1)] / (3n(n−1))`,
    * numerator in decimal(38,0) (magnitude contract: per-key n ≲ 3·10⁷
    * keeps n_a·n_b·n³ inside 38 digits — past that a shift of any size
    * is significant and the test is the wrong tool anyway), and the
    * continuity-corrected z (±1 on the 2U scale = ±0.5 on U) goes
    * through the shared [[rankZSql]] IEEE tree — micro-unit z replays
    * bit-for-bit. Degenerate keys (one-sided, all-tied, n < 2) → NULL
    * z, never a blow-up.
    *
    * Scale shape (the x15 discipline): rows collapse to the per-key
    * VALUE histogram in one map-side-partial aggregate; the cumulative
    * window and every moment ride the distinct-value relation, so a
    * 10⁹-row key with cent-granular values costs its distinct cents,
    * not its rows, after the first shuffle. Everything shares the one
    * key domain.
    *
    * @param df one row per observation
    * @param treatCol boolean column: true = treatment arm (the "a" side)
    * @param centsCol pre-integerized value (cents, ms, …)
    * @return (key, n, n_a, n_b, u2_a = 2·U_treatment, z_micro)
    */
  def mannWhitneyU(
      df: DataFrame,
      keyCol: String,
      treatCol: String,
      centsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vc = df
      .select(col(keyCol).as("key"), col(treatCol).cast("boolean").as("t"),
        col(centsCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("t").isNotNull)
      .groupBy("key", "v")
      .agg(count(lit(1)).as("c"),
        sum(col("t").cast("long")).as("ca"))
    val w = Window.partitionBy("key").orderBy("v")
    vc.withColumn("hi", sum(col("c")).over(w))
      .withColumn("lo", col("hi") - col("c") + 1)
      .groupBy("key")
      .agg(sum(col("c")).as("n"),
        sum(col("ca")).as("n_a"),
        // 2× rank sum of the treatment arm: each tied member adds lo+hi
        sum((col("ca") * (col("lo") + col("hi"))).cast("decimal(38,0)"))
          .as("r2a"),
        // tie term Σ t(t−1)(t+1), decimal before the cubing
        sum(col("c").cast("decimal(19,0)") * (col("c") - 1) * (col("c") + 1))
          .as("tsum"))
      .withColumn("n_b", col("n") - col("n_a"))
      .withColumn("u2_a",
        (col("r2a") - col("n_a").cast("decimal(38,0)") * (col("n_a") + 1))
          .cast("long"))
      .withColumn("s2", col("u2_a") - col("n_a") * col("n_b"))
      .withColumn("s2_adj", expr(
        "CASE WHEN s2 > 0 THEN s2 - 1 WHEN s2 < 0 THEN s2 + 1 ELSE 0L END"))
      .withColumn("var_num",
        col("n_a").cast("decimal(19,0)") * col("n_b") *
          (col("n").cast("decimal(19,0)") * (col("n") + 1) * (col("n") - 1)
            - col("tsum")))
      .withColumn("var_den",
        lit(3L) * col("n") * (col("n") - 1))
      .withColumn("z_micro", expr(rankZSql("s2_adj", "var_num", "var_den")))
      .select("key", "n", "n_a", "n_b", "u2_a", "z_micro")
  }

  /** Spearman rank correlation per key — Pearson's co-movement question
    * asked of the RANKS, so one mis-scaled or heavy-tailed metric
    * cannot fake (or hide) an association: ρ_s measures monotone
    * relationship, the robust complement to [[corrMatrix]].
    *
    * Exactness: both columns get exact 2× midranks from their per-key
    * value histograms (tied run [lo, hi] → integer `lo + hi`; the
    * mannWhitneyU recipe per column), rows pick their ranks up by
    * JOINING the value-level rank tables (rows never enter a window —
    * the x15 shape survives a 10⁹-row key), and the five rank moments
    * are exact decimal sums feeding the SAME shared [[corrSql]] IEEE
    * tree as x35/g11/e41 — the 6dp ρ replays bit-for-bit. Constant
    * columns (zero rank variance) → NULL.
    *
    * @param df one row per observation; x/y pre-integerized
    * @return (key, n, rho — 6dp, NULL on degenerate variance)
    */
  def spearmanCorr(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("key"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
    def ranks(vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("key").orderBy(vCol)
      base.groupBy("key", vCol).agg(count(lit(1)).as("c"))
        .withColumn("hi", sum(col("c")).over(w))
        .select(col("key"), col(vCol),
          (lit(2) * col("hi") - col("c") + 1).as(out))
    }
    base
      .join(ranks("x", "rx"), Seq("key", "x"))
      .join(ranks("y", "ry"), Seq("key", "y"))
      .select(col("key"),
        col("rx").cast("decimal(19,0)").as("rx"),
        col("ry").cast("decimal(19,0)").as("ry"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("s_x"), sum(col("ry")).as("s_y"),
        sum(col("rx") * col("rx")).as("s_xx"),
        sum(col("ry") * col("ry")).as("s_yy"),
        sum(col("rx") * col("ry")).as("s_xy"))
      .withColumn("rho", expr(corrSql("s_xy", "s_x", "s_y", "s_xx", "s_yy")))
      .select("key", "n", "rho")
  }
}

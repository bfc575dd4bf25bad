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
      k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val vc = df
      .select(col(keyCol).as("key"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("v"))
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
}

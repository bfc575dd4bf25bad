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

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/dbt-test
  * shape): a list of constraints compiles into ONE aggregation pass over
  * the table, returning a constraint-sized report — never a per-rule
  * scan. The pipeline gate every warehouse load runs before publishing a
  * table.
  *
  * Determinism: every metric is an INTEGER — row/violation counts,
  * duplicate surpluses, basis-point fractions (`10000·x div n`, floored)
  * — so the report replays bit-for-bit in any engine; no double ratios
  * cross the boundary.
  *
  * Scale notes: the single agg pass is map-side partial everywhere
  * except `uniqueness`, whose exact `count(distinct)` shuffles the
  * column's distinct values (the exact tier — at corpus scale swap in
  * `approx_count_distinct`, accepting HLL error on the dup-surplus
  * metric; same trade documented on x14's profiler). Referential
  * integrity is necessarily a join, not an aggregate: it's a separate
  * [[refViolations]] relation the caller unions in, planned as an
  * anti-join the optimizer can broadcast when the dimension is small.
  */
object DataQuality {

  /** One constraint: a named integer aggregate metric + a pass predicate
    * over it.
    */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Fraction of non-null values, floored to basis points, must reach
    * `minBp` (10000 = fully populated). The `greatest(count, 1)` guard
    * keeps an empty table at metric 0 instead of an ANSI
    * division-by-zero — empty fails any positive bar, which is the
    * right polarity for a load gate.
    */
  def completeness(c: String, minBp: Long): Check =
    Check(s"completeness_$c",
      expr(s"10000 * count(`$c`) div greatest(count(*), 1)"), m => m >= minBp)

  /** Duplicate surplus (non-null count − distinct count) must be 0. */
  def uniqueness(c: String): Check =
    Check(s"uniqueness_$c",
      expr(s"count(`$c`) - count(distinct `$c`)"), m => m === 0L)

  /** Count of non-null values outside [lo, hi] must be 0. */
  def bounds(c: String, lo: Column, hi: Column): Check =
    Check(s"bounds_$c",
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)), m => m <= 0L)

  /** Count of non-null values outside the accepted set must be 0. */
  def acceptedValues(c: String, accepted: Seq[String]): Check =
    Check(s"accepted_$c",
      sum(when(col(c).isNotNull && !col(c).isin(accepted: _*), 1L).otherwise(0L)),
      m => m <= 0L)

  /** Row count must lie in [lo, hi] (hi = Long.MaxValue for "at least"). */
  def rowCount(lo: Long, hi: Long = Long.MaxValue): Check =
    Check("row_count", count(lit(1)), m => m >= lo && m <= hi)

  /** Compile the checks into one agg pass; returns
    * (check_name, metric, passed) — `sum` metrics over an empty table
    * evaluate NULL, reported as 0 (an empty table violates nothing but
    * `rowCount`).
    */
  /** Per-slice freshness report — the ingest-liveness monitor (a
    * source whose `lag_s` grows is a stalled upstream; `n_recent`
    * collapsing while others hold is a partial outage — both are
    * invisible to row counts alone). All integer: per-slice last event
    * time in epoch seconds, lag behind the freshest slice, and the
    * event count inside the trailing `recentSeconds` window anchored
    * at the GLOBAL max (the data's own "now" — wall-clock would make
    * the report unreproducible).
    *
    * Scale shape: ONE scan into a cached (slice, second) histogram —
    * bounded by the observation window in seconds, not the row count —
    * and every report column (per-slice totals, the global anchor, the
    * trailing-window counts) derives from that tiny relation.
    *
    * @return (slice, n, last_epoch_s, lag_s, n_recent)
    */
  def freshness(
      df: DataFrame,
      sliceCol: String,
      tsCol: String,
      recentSeconds: Long = 86400L): DataFrame = {
    require(recentSeconds >= 1, s"recentSeconds must be >= 1, got $recentSeconds")
    val bh = freshSlot.persist(
      df.select(col(sliceCol).as("slice"),
          expr(s"unix_micros(`$tsCol`) div 1000000").as("es"))
        .where(col("slice").isNotNull && col("es").isNotNull)
        .groupBy("slice", "es").agg(count(lit(1)).as("c")))
    val per = bh.groupBy("slice")
      .agg(sum(col("c")).as("n"), max(col("es")).as("last_epoch_s"))
    val anchor = per.agg(max(col("last_epoch_s")).as("t_max"))
    val recent = bh.crossJoin(broadcast(anchor))
      .where(col("es") > col("t_max") - recentSeconds)
      .groupBy("slice").agg(sum(col("c")).as("n_recent"))
    per.crossJoin(broadcast(anchor))
      .join(recent, Seq("slice"), "left")
      .na.fill(0L, Seq("n_recent"))
      .select(col("slice"), col("n"), col("last_epoch_s"),
        (col("t_max") - col("last_epoch_s")).as("lag_s"), col("n_recent"))
  }

  private val freshSlot = new CacheSlot

  /** jsonKeyCensus's key-grain aggregate feeds the census rows AND the
    * sentinel row count — slot-cached so the corpus parses once.
    */
  private val censusSlot = new CacheSlot

  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(checks.map(_.name).distinct.size == checks.size, "duplicate check names")
    val agg = df.agg(
      coalesce(checks.head.metric, lit(0L)).cast("long").as(checks.head.name),
      checks.tail.map(c => coalesce(c.metric, lit(0L)).cast("long").as(c.name)): _*)
    val rows = checks.map(c => struct(
      lit(c.name).as("check_name"),
      col(c.name).as("metric"),
      c.pass(col(c.name)).cast("int").as("passed")))
    agg.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Referential integrity as a report row: count of fact rows whose
    * non-null key has no partner in the dimension (nulls are
    * completeness's business, not membership's).
    */
  def refViolations(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      name: String): DataFrame = {
    fact.where(col(factKey).isNotNull)
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("metric"))
      .select(lit(name).as("check_name"), col("metric"),
        (col("metric") === 0L).cast("int").as("passed"))
  }

  /** Semi-structured key census: which JSON keys exist in a payload
    * column, how often, with how many distinct values — the
    * schema-drift monitor for the `props`-style columns every event
    * feed carries (a producer silently adding/renaming a field shows up
    * here long before anything downstream parses it).
    *
    * Values are compared as STRINGS (`map<string,string>` coercion) —
    * the census asks "what shapes arrive", not "what do they mean".
    * One scan, one key-grain aggregate; share is floored bp over rows
    * with a parseable payload.
    *
    * @return one row per key: (key, n_present, n_distinct, share_bp)
    */
  def jsonKeyCensus(df: DataFrame, jsonCol: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    // a sentinel entry per row makes the row count fall out of the SAME
    // key-grain aggregate — one corpus scan serves the census AND the
    // share denominator (the v22 multi-consumer lesson). A real payload
    // key equal to the control-char sentinel would collide (map_concat
    // raises under the default dedup policy) — documented, not checked.
    val sentinel = "\u0000__rows__"
    val kv = df.where(col(jsonCol).isNotNull)
      .select(from_json(col(jsonCol), MapType(StringType, StringType)).as("m"))
      .where(col("m").isNotNull)
      .select(explode(map_concat(col("m"), map(lit(sentinel), lit(""))))
        .as(Seq("key", "value")))
    val agg = censusSlot.persist(
      kv.groupBy("key")
        .agg(count(lit(1)).as("n_present"),
          countDistinct(col("value")).as("n_distinct")))
    val tot = agg.where(col("key") === sentinel)
      .select(col("n_present").as("n_rows"))
    agg.where(col("key") =!= sentinel)
      .crossJoin(tot)
      .withColumn("share_bp", expr("(10000 * n_present) div n_rows"))
      .select("key", "n_present", "n_distinct", "share_bp")
  }

  /** Functional-dependency profiler: does `lhs → rhs` hold? The
    * warehouse-onboarding question ("is this a candidate key? can I
    * denormalize on it?") answered as a count of violating determinant
    * groups — groups where rhs takes more than one distinct non-null
    * value. NULL rhs values are completeness's business, not
    * dependency's (a group whose rhs is entirely NULL determines
    * nothing and violates nothing).
    *
    * Scale shape: one partial-aggregated groupBy on the determinant
    * (the only shuffle), then a scalar rollup of the group-grain
    * relation. Violation share is floored basis points over groups.
    *
    * @return one row: (check_name, n_groups, n_violating, violation_bp,
    *         max_distinct — worst group's rhs cardinality, passed)
    */
  def fdViolations(
      df: DataFrame,
      lhs: Seq[String],
      rhs: String,
      name: String): DataFrame = {
    require(lhs.nonEmpty, "empty determinant")
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(col(rhs)).as("nd"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
        max(col("nd")).as("max_distinct"))
      .select(lit(name).as("check_name"), col("n_groups"),
        col("n_violating"),
        expr("(10000 * n_violating) div n_groups").as("violation_bp"),
        col("max_distinct"),
        (col("n_violating") === 0L).cast("int").as("passed"))
  }
}

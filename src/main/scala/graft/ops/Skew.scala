package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: key salting.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) is the first
  * line of defense and needs no code. Salting is the explicit fallback
  * when a single hot key exceeds what one task can hold even after AQE
  * splits — the classic null-key / celebrity-key problem at 100 TB.
  *
  * Mechanics: the skewed (large) side gets a uniform random salt in
  * [0, buckets); the small side is exploded `buckets`-fold with every
  * salt value; the join key becomes (key, salt). Hot keys spread across
  * `buckets` tasks at the cost of replicating the build side `buckets`×
  * — use only for the keys that need it (`saltedJoinHotKeys`) when the
  * build side is large.
  */
object Skew {

  /** Full salted inner/left equi-join: every key salted. Use when the
    * small side is cheap to replicate `buckets`-fold.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    // any salt assignment is correct (the small side carries every salt);
    // seeded rand keeps runs reproducible
    val salted = large.withColumn("_salt", floor(rand(42) * buckets).cast("int"))
    val exploded = small.withColumn("_salt", explode(lit((0 until buckets).toArray)))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Hybrid salted join: only the listed hot keys are salted; the long
    * tail joins normally. One union of two shuffled joins — the standard
    * production pattern when a handful of keys dominate.
    */
  def saltedJoinHotKeys(
      large: DataFrame,
      small: DataFrame,
      key: String,
      hotKeys: Seq[Any],
      buckets: Int): DataFrame = {
    val isHot = col(key).isin(hotKeys: _*)
    val hotJoined = saltedJoin(large.where(isHot), small.where(isHot), key, buckets)
    // inner join: null keys never match, so the cold side can drop them
    // up front (`!isHot` is NULL — excluded — for null keys)
    val coldJoined = large.where(!isHot).join(small.where(!isHot), Seq(key))
    hotJoined.unionByName(coldJoined)
  }

  /** Key-skew profile — the diagnostic that DECIDES between the plain
    * join, AQE splitting, and [[saltedJoinHotKeys]]: the top-N heaviest
    * keys with their share of the table and their multiple of the
    * uniform per-key share (`skew_x` = how many times hotter than
    * average — the number a salting `buckets` choice is read from).
    *
    * Shape: one hash aggregate to per-key counts, then the bounded
    * string-keyed heap ([[graft.functions.TopKAgg.top_k_by_score_str]])
    * folds partials to N entries BEFORE the exchange — the profile of a
    * 10^10-key table ships partitions·N heap rows, never a sorted key
    * list. The cumulative share runs over the N returned rows only.
    * All ratios are floored basis points / integer multiples — exact
    * LONGs (counts < 2^53 keeps the heap's double score exact).
    *
    * Null keys are excluded: they never match an equi-join (inner-join
    * null keys drop out), so their fix is a filter, not salting —
    * profile them with a plain null-count check, not here.
    *
    * @return (rank, key, cnt, share_bp, cum_share_bp, skew_x) — key as
    *         string; ties on count break by key ascending
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    counts.groupBy()
      .agg(graft.functions.TopKAgg
        .top_k_by_score_str(col("cnt").cast("double"), col("key"), topN).as("tk"))
      .select(posexplode(col("tk")))
      .select((col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("key"),
        col("col.cosine").cast("long").as("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("rank").rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("key"), col("cnt"),
        expr("(10000L * cnt) div total").as("share_bp"),
        expr("(10000L * cum) div total").as("cum_share_bp"),
        expr("(cnt * n_keys) div total").as("skew_x"))
  }
}

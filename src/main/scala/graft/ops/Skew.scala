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
}

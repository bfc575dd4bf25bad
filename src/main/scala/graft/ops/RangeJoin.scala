package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — the range-join primitive Spark lacks: a bare
  * `a.start < b.end AND b.start < a.end` condition has no equi-key, so
  * the planner falls back to BroadcastNestedLoopJoin (all-pairs; dies
  * past the broadcast threshold). The standard fix is bucketing: every
  * interval explodes into the fixed-width buckets it covers, pairs form
  * by bucket EQUI-join (uniform keys, shuffle-hash/broadcast — AQE
  * decides), and the exact predicate verifies.
  *
  * Duplicate suppression is algebraic, not a `distinct()`: a pair
  * overlapping k shared buckets would emit k times, so only the bucket
  * containing `max(a.start, b.start)` — the first instant both
  * intervals are live, covered by both sides by construction — keeps
  * the pair. No post-join shuffle.
  *
  * Contract: half-open intervals `[start, end)` over NON-NEGATIVE longs
  * (epoch micros, token offsets, byte ranges); empty intervals
  * (start ≥ end) overlap nothing. Negative bounds are NOT rejected and
  * still pair CORRECTLY (`div` truncates toward zero — a monotone
  * mapping, so overlapping intervals still share a bucket and the
  * first-overlap dedup still picks a bucket both sides cover) — but
  * bucket 0 then spans (−W, W), twice the width of every other bucket,
  * silently doubling its collision volume; shift such domains to ≥ 0
  * upstream. `bucketWidth` trades fan-out for collision volume — pick
  * it near the typical interval length: rows replicate ×⌈len/W⌉, while
  * candidate pairs grow with co-bucketed density. A single
  * pathologically long interval replicates into many buckets (len/W
  * rows) — cap interval length upstream or raise W if the domain
  * allows such outliers.
  */
object RangeJoin {

  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // fail fast on shapes that would silently corrupt or confusingly fail
    // three operators later: a pre-existing internal column (clobbered
    // then dropped), or bound columns sharing a name across sides
    // (ambiguous reference at resolution time, far from the cause)
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "inputs must not carry a __bucket column (internal)")
    val dup = Set(lStart, lEnd).intersect(Set(rStart, rEnd))
    require(dup.isEmpty,
      s"bound columns must be named apart across sides (shared: ${dup.mkString(", ")})" +
        " — alias one side before joining")
    // bound names are interpolated into SQL below; a backtick would
    // break parsing far from this call site — reject it here
    for (n <- Seq(lStart, lEnd, rStart, rEnd))
      require(!n.contains("`"), s"bound column name must not contain backticks: $n")
    val W = bucketWidth
    val (ls, le) = (col(lStart), col(lEnd))
    val (rs, re) = (col(rStart), col(rEnd))
    // integral `div`, never `/`: double division rounds at integer
    // quotient boundaries (epoch-micro magnitudes sit past the exact
    // double grid for the intermediate), which would misbucket edges
    def buckets(s: String, e: String) =
      explode(expr(s"sequence(`$s` div ${W}L, (`$e` - 1) div ${W}L)"))
    val lb = left.where(ls < le).withColumn("__bucket", buckets(lStart, lEnd))
    val rb = right.where(rs < re).withColumn("__bucket", buckets(rStart, rEnd))
    lb.join(rb, Seq("__bucket"))
      .where(ls < re && rs < le)
      // first-overlap-bucket dedup: exactly one surviving bucket per pair
      .where(col("__bucket") === expr(s"greatest(`$lStart`, `$rStart`) div ${W}L"))
      .drop("__bucket")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with `rightTs <= leftTs`, per key — the canonical time-series
  * enrichment operator (market data, feature stores, attribution).
  *
  * Spark has no built-in as-of join; the naive theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + max) is a quadratic range join.
  * This implementation is the scalable union-sort pattern:
  *
  *   1. tag both inputs and union them (right rows sort BEFORE left rows
  *      on ts ties so an exactly-simultaneous right row is visible);
  *   2. one window pass per key ordered by (ts, tag) carries the latest
  *      right row forward as ONE struct — `last(struct, ignoreNulls)`
  *      over rows-unbounded-preceding. The struct is non-null for every
  *      right row even when its FIELDS are null, so a legitimate null in
  *      the latest right row is preserved (per-column carry would fill
  *      it from an older row) and all carried columns always come from
  *      the same right row;
  *   3. keep the left rows.
  *
  * Right-row ties: when several right rows share one (key, ts), which
  * one is carried is NOT deterministic (the window orders by (ts, tag)
  * only) — pre-aggregate the right side to one row per (key, ts) if that
  * matters (see the e4 query's signups dedup).
  *
  * Cost: ONE shuffle on the key and one sort — same shape as any
  * windowed aggregation, linear in |L|+|R|, no range explosion. Key skew
  * follows the same AQE/salting story as every other keyed op.
  */
object AsOfJoin {

  /** @param left     probe side (each row enriched)
    * @param right    reference side (carried forward)
    * @param key      equi-key column present on both sides
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right`
    * @param rightCols columns of `right` to carry (renamed as-is in output)
    * @param direction match selection (the pandas `merge_asof` surface):
    *   - `"backward"` (default): latest right row with rightTs ≤ leftTs;
    *   - `"forward"`: earliest right row with rightTs ≥ leftTs;
    *   - `"nearest"`: the closer of the two; exact distance ties take
    *     the backward match (pandas' rule).
    * @param tolerance maximum |leftTs − rightTs| for a match to count —
    *   in MICROSECONDS for timestamp columns, raw units for numeric ts.
    *   Beyond-tolerance matches carry null, exactly like no-match rows.
    *
    * All three directions keep the union-sort shape: one shuffle on the
    * key, one sort, one or two window passes over the same sorted data —
    * never a range join. The carried struct embeds the matched right
    * row's numeric ts, so tolerance and nearest-distance compare against
    * the ACTUAL matched row with no extra join.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), s"tolerance must be non-negative, got $tolerance")
    require(!rightCols.contains(key), "rightCols must not repeat the key")
    val reserved = Set("_ts", "_tsn", "_tag", "_r")
    require(!leftCols.exists(reserved), "reserved column name in left input")
    // the right side is rebuilt around the same scratch columns — a data
    // column named _ts/_tsn/_tag/_r would be silently overwritten, and a
    // rightCols name colliding with a left column would emit duplicate
    // output columns (ambiguous downstream); reject both loudly
    require(!right.columns.exists(reserved),
      "reserved column name (_ts/_tsn/_tag/_r) in right input")
    require(!rightCols.contains("_cts"), "reserved struct field _cts in rightCols")
    require(!rightCols.exists(leftCols.toSet),
      s"rightCols collide with left columns: ${rightCols.filter(leftCols.toSet).mkString(", ")}")

    // numeric event time: micros for timestamps, raw value otherwise —
    // distance arithmetic and tolerance run on this, never on doubles
    def tsNum(df: DataFrame, c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case _ => col(c).cast("long")
    }

    // one atomic struct of the carried columns (+ the matched row's
    // numeric ts for tolerance/nearest); NULL only for left rows
    val rStruct = struct(
      (rightCols.map(col) :+ tsNum(right, rightTs).as("_cts")): _*)
    val rStructType = org.apache.spark.sql.types.StructType(
      right.select((rightCols.map(col) :+ tsNum(right, rightTs).as("_cts")): _*).schema.fields)

    // tie order: BACKWARD wants an equal-ts right row visible in the
    // [preceding, current] window (right sorts before left); FORWARD
    // wants it visible in [current, following] (right sorts after).
    // NEAREST uses the backward order — its forward pass misses only the
    // equal-ts right row, which the backward pass already matched at
    // distance 0 (and ties prefer backward anyway).
    val (lTag, rTag) = if (direction == "forward") (0, 1) else (1, 0)
    val lAligned = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tsn", tsNum(left, leftTs))
      .withColumn("_tag", lit(lTag))
      .withColumn("_r", lit(null).cast(rStructType))
      .select((leftCols ++ Seq("_ts", "_tsn", "_tag", "_r")).map(col): _*)

    val rAligned = leftCols.filterNot(_ == key).foldLeft(
      right
        .withColumn("_ts", col(rightTs))
        .withColumn("_tsn", tsNum(right, rightTs))
        .withColumn("_tag", lit(rTag))
        .withColumn("_r", rStruct)
    )((df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
      .select((leftCols ++ Seq("_ts", "_tsn", "_tag", "_r")).map(col): _*)

    val order = Window.partitionBy(key).orderBy(col("_ts").asc, col("_tag").asc)
    val wBack = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // per-side tolerance: a beyond-tolerance candidate is no candidate
    def withinTol(cand: Column, dist: Column): Column = tolerance match {
      case Some(t) => when(cand.isNotNull && dist <= t, cand)
      case None => cand
    }

    val unioned = lAligned.unionByName(rAligned)
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("_c", {
          val b = last(col("_r"), ignoreNulls = true).over(wBack)
          withinTol(b, col("_tsn") - b.getField("_cts"))
        })
      case "forward" =>
        unioned.withColumn("_c", {
          val f = first(col("_r"), ignoreNulls = true).over(wFwd)
          withinTol(f, f.getField("_cts") - col("_tsn"))
        })
      case "nearest" =>
        unioned
          .withColumn("_b", last(col("_r"), ignoreNulls = true).over(wBack))
          .withColumn("_f", first(col("_r"), ignoreNulls = true).over(wFwd))
          .withColumn("_db", col("_tsn") - col("_b").getField("_cts"))
          .withColumn("_df", col("_f").getField("_cts") - col("_tsn"))
          .withColumn("_bv", withinTol(col("_b"), col("_db")))
          .withColumn("_fv", withinTol(col("_f"), col("_df")))
          .withColumn("_c",
            when(col("_bv").isNotNull && col("_fv").isNotNull,
              when(col("_db") <= col("_df"), col("_bv")).otherwise(col("_fv")))
              .otherwise(coalesce(col("_bv"), col("_fv"))))
    }
    carried
      .where(col("_tag") === lTag)
      .select((leftCols.map(col) ++ rightCols.map(c => col("_c").getField(c).as(c))): _*)
  }
}

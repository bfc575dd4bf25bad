package graft.ops

import org.apache.spark.sql.DataFrame
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
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.contains(key), "rightCols must not repeat the key")
    require(!leftCols.exists(Set("_ts", "_tag", "_r")), "reserved column name in left input")
    // the right side is rebuilt around the same scratch columns — a data
    // column named _ts/_tag/_r would be silently overwritten, and a
    // rightCols name colliding with a left column would emit duplicate
    // output columns (ambiguous downstream); reject both loudly
    require(!right.columns.exists(Set("_ts", "_tag", "_r")),
      "reserved column name (_ts/_tag/_r) in right input")
    require(!rightCols.exists(leftCols.toSet),
      s"rightCols collide with left columns: ${rightCols.filter(leftCols.toSet).mkString(", ")}")

    // one atomic struct of the carried columns; NULL only for left rows
    val rStructType = org.apache.spark.sql.types.StructType(
      right.select(rightCols.map(col): _*).schema.fields)
    val lAligned = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(rStructType))
      .select((leftCols ++ Seq("_ts", "_tag", "_r")).map(col): _*)

    val rAligned = leftCols.filterNot(_ == key).foldLeft(
      right
        .withColumn("_ts", col(rightTs))
        .withColumn("_tag", lit(0))
        .withColumn("_r", struct(rightCols.map(col): _*))
    )((df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
      .select((leftCols ++ Seq("_ts", "_tag", "_r")).map(col): _*)

    val w = Window.partitionBy(key).orderBy(col("_ts").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col("_c").getField(c).as(c))): _*)
  }
}

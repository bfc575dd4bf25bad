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
  *   2. one window pass per key ordered by (ts, tag): `last(right-cols,
  *      ignoreNulls)` over rows-unbounded-preceding carries the latest
  *      right values forward;
  *   3. keep the left rows.
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

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
    val lAligned = rightCols.foldLeft(l)((df, c) => df.withColumn(s"_r_$c", lit(null)))

    val r0 = right.select((key +: rightTs +: rightCols).map(col): _*)
    val rAligned0 = rightCols.foldLeft(
      r0.withColumn("_ts", col(rightTs)).withColumn("_tag", lit(0))
    )((df, c) => df.withColumn(s"_r_$c", col(c)))
    // align right to the left schema: left-only columns become nulls
    val rAligned = leftCols.filterNot(c => c == key).foldLeft(rAligned0) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select((leftCols ++ Seq("_ts", "_tag") ++ rightCols.map(c => s"_r_$c")).map(col): _*)

    val unioned = lAligned
      .select((leftCols ++ Seq("_ts", "_tag") ++ rightCols.map(c => s"_r_$c")).map(col): _*)
      .unionByName(rAligned)

    val w = Window.partitionBy(key).orderBy(col("_ts").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"_c_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }

    carried
      .where(col("_tag") === 1)
      .select((leftCols.map(col) ++ rightCols.map(c => col(s"_c_$c").as(c))): _*)
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for grouped count/sum aggregates
  * (Blakeley, Larson & Tompa 1986; the delta-processing core of
  * DBToaster and every streaming materialized view): fold a CDC batch
  * into a maintained aggregate WITHOUT rescanning the base table.
  *
  * Count and sum are self-maintainable under both inserts and deletes —
  * `agg(base ⊎ Δ) = agg(base) ⊎ agg(Δ)` with deletes as −1-weighted
  * rows — which is exactly why warehouse rollups standardize on them.
  * Min/max are NOT (a delete of the current min forces a group rescan);
  * this operator deliberately refuses to fake them. Derived forms
  * (avg = sum/count) belong downstream of the maintained state.
  *
  * Scale shape: the delta aggregates alone (Δ-sized, one hash agg),
  * then ONE key-keyed full-outer join against the maintained state —
  * the base TABLE is never read, which is the entire point at 100 TB:
  * maintenance cost follows the delta, not the data. Groups whose
  * count reaches zero drop from the state (the ⊎ annihilation rule); a
  * count going NEGATIVE means the delta deleted rows the state never
  * held — corrupt lineage — and fails loudly rather than persisting a
  * wrong view.
  */
object IncrementalAgg {

  /** Apply a CDC delta to a maintained grouped aggregate.
    *
    * @param baseAgg  maintained state: `keyCols`, `n_rows`, and one
    *                 summed column per measure (named by the measure's
    *                 output name)
    * @param delta    CDC rows: `keyCols`, `opCol` (+1 insert / −1
    *                 delete), and each measure's raw value column
    * @param keyCols  grouping keys
    * @param opCol    the ±1 weight column in `delta`
    * @param measures (rawValueCol → outputSumName), e.g.
    *                 `Seq("cents" -> "sum_cents")`
    * @return the post-delta state, same shape as `baseAgg`
    */
  def applyDelta(
      baseAgg: DataFrame,
      delta: DataFrame,
      keyCols: Seq[String],
      opCol: String,
      measures: Seq[(String, String)]): DataFrame = {
    require(keyCols.nonEmpty, "applyDelta needs at least one key column")
    val dAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(col(opCol)).as("_dn"),
        measures.map { case (raw, name) =>
          sum(col(opCol) * col(raw)).as(s"_d_$name")
        }: _*)
    val merged = baseAgg.join(dAgg, keyCols, "full_outer")
      .withColumn("_n", coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
    val guarded = merged.withColumn("n_rows", expr(
      "if(_n >= 0, _n, raise_error(concat('IncrementalAgg: count went negative (', " +
        "_n, ') — the delta deleted rows the maintained state never held')))"))
    measures.foldLeft(guarded) { case (df, (_, name)) =>
        df.withColumn(name,
          coalesce(col(name), lit(0L)) + coalesce(col(s"_d_$name"), lit(0L)))
      }
      .where(col("n_rows") > 0)
      .select((keyCols.map(col) :+ col("n_rows")) ++ measures.map(m => col(m._2)): _*)
  }
}

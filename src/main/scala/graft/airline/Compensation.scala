package graft.airline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compensation assignment (reference pipeline 3,
  * `/root/reference/src/datalake_compensation.py:88-142`), decorrelated.
  *
  * The reference runs a per-row loop that issues ~3 synchronous warehouse
  * queries per mart row (2 correlated scalar subqueries + an UPDATE) — the
  * anti-pattern SURVEY §3 flags. Semantically it computes, per flight
  * `cod_vuelo`:
  *
  *   disp  = floor(count(*) / 20) * 3          (A1 — quota; see note below)
  *   dados = count(* where compensacion IN
  *            (ASISTENCIA_PREFERENCIAL, ASIENTO_PREFERENCIAL))  (A2)
  *
  * and, for each row with a birthdate, when `disp - dados > 0`:
  *   age < 14  → ASISTENCIA_PREFERENCIAL   (consumes quota)
  *   age > 60  → ASIENTO_PREFERENCIAL      (consumes quota)
  *   otherwise → NO APLICA                 (does NOT consume quota)
  * Rows on flights with no remaining quota keep their existing value.
  * `age` is the calendar-year difference (S5: year(today) − birth year —
  * deliberately NOT a true age; we preserve that semantic and take the
  * as-of year as a parameter for determinism).
  *
  * Determinism contract (SURVEY §2.8): the reference consumes quota in
  * row-arrival order, which is racy under parallel workers. We re-specify:
  * quota is computed once per flight at batch start; age-eligible rows are
  * ranked by `dni` (stable, unique per passenger per flight in practice)
  * and the first `disp − dados` ranks are granted. Mid-age rows get
  * NO APLICA whenever their flight had any remaining quota at batch start.
  * This preserves the reference's invariant (per-flight preferential
  * grants never exceed quota) while being order-independent.
  *
  * A1 rounding note: BigQuery `CAST(x AS INT64)` rounds half away from
  * zero, so the reference's `cast(count(1)/20 as int64)*3` would round UP
  * for counts with remainder ≥ 10. The intent is "3 preferential seats per
  * full block of 20 sold" — we use floor and document the divergence
  * (SURVEY §2.4 A1).
  *
  * Scale: two hash aggregations on `cod_vuelo` (map-side partial combine),
  * one join of the per-flight quota table back (|flights| ≪ |rows|, so
  * AQE converts it to a broadcast at runtime from the materialized
  * aggregate's real size — no static hint, same policy as every other
  * engine join), one window for the eligible ranking partitioned by
  * flight — no correlated subqueries, no per-row I/O. Replaces the
  * reference's ~3N warehouse round-trips with a constant number of
  * distributed passes.
  */
object Compensation {

  val Asistencia = "ASISTENCIA_PREFERENCIAL"
  val Asiento = "ASIENTO_PREFERENCIAL"
  val NoAplica = "NO APLICA"

  /** @param mart 21-column mart (compensacion possibly pre-populated)
    * @param asOfYear the "today" year for the S5 age rule, injected for
    *                 determinism (reference uses wall-clock today)
    */
  def apply(mart: DataFrame, asOfYear: Int): DataFrame = {
    val anios = lit(asOfYear) - year(col("fecha_de_nacimiento"))
    val isPref = col("compensacion").isin(Asistencia, Asiento)

    val quota = mart
      .groupBy("cod_vuelo")
      .agg(
        (floor(count(lit(1)) / 20) * 3).as("num_tickets_pref_disp"),
        sum(when(isPref, 1L).otherwise(0L)).as("num_tickets_dados")
      )
      .withColumn("quota_left", col("num_tickets_pref_disp") - col("num_tickets_dados"))
      .select("cod_vuelo", "quota_left")

    val aged = mart.withColumn("anios", when(col("fecha_de_nacimiento").isNotNull, anios))
    val eligible = col("anios").isNotNull &&
      (col("anios") < 14 || col("anios") > 60) &&
      !coalesce(isPref, lit(false)) // already-granted rows don't re-consume quota

    // Position of each eligible row among its flight's eligible rows, in
    // stable (dni, fecha_reserva) order: a running conditional count, so
    // ineligible rows between two eligible ones don't inflate the rank.
    val w = Window
      .partitionBy("cod_vuelo")
      .orderBy(col("dni").asc, col("fecha_reserva").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = aged.withColumn("elig_rank", sum(when(eligible, 1L).otherwise(0L)).over(w))

    // No broadcast hint: the quota aggregate's shuffle stage materializes
    // anyway, so AQE sizes the join from its REAL output (flight-dim
    // cardinality) and broadcasts at runtime — while a corpus whose
    // flight dim somehow outgrew memory would degrade to a shuffle join
    // instead of dying at the driver.
    ranked
      .join(quota, Seq("cod_vuelo"), "left")
      .withColumn(
        "compensacion",
        // coalesce: a NULL cod_vuelo (venta whose cod_avion missed the
        // dim) never matches the quota table -> quota_left NULL; such
        // rows must keep their value, not fall through to NO APLICA
        when(col("anios").isNull || coalesce(col("quota_left"), lit(0L)) <= 0, col("compensacion"))
          .when(eligible && col("elig_rank") <= col("quota_left"),
            when(col("anios") < 14, Asistencia).otherwise(Asiento)) // granted
          .when(col("anios") < 14 || col("anios") > 60, col("compensacion")) // already-pref or beyond quota
          .otherwise(lit(NoAplica)) // mid-age on a flight with remaining quota
      )
      .select(AirlineSchemas.martColumns.map(col): _*)
  }
}

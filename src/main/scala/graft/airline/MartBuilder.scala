package graft.airline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ObfuscateName.obfuscate_name

/** Mart build (reference pipeline 2, `/root/reference/src/datalake_to_mart.py`),
  * re-expressed as one declarative Spark plan:
  *
  *   venta ⟕ broadcast(pasajero) on dni       (J1)
  *         ⟕ broadcast(dedup(vuelo)) on cod_avion  (J2, dedup = W1)
  *   then monto := abs(monto)                 (S1)
  *   and  nombre_completo := obfuscate(...)   (S2, native expression)
  *   plus compensacion := NULL                (mart schema col 21)
  *
  * Scale design: both dimensions are explicitly `broadcast()` (the
  * reference asserts dims fit in memory — datalake_to_mart.py:76,92 — and
  * at 100 TB the fact side is the big one; a broadcast-hash join avoids
  * shuffling the fact entirely). If a dimension outgrew the broadcast
  * threshold, dropping the hint degrades gracefully to a shuffled join
  * under AQE. The scalar transforms are all codegen'd expressions fused
  * into the probe-side stage — zero extra passes over the fact.
  */
object MartBuilder {

  /** W1: one flight row per `cod_vuelo`, lowest `cod_tripulacion` wins
    * (ROW_NUMBER ... ORDER BY cod_tripulacion ASC, rn=1 —
    * datalake_to_mart.py:170-179).
    */
  def dedupFlights(vuelo: DataFrame): DataFrame = {
    val w = Window.partitionBy("cod_vuelo").orderBy(col("cod_tripulacion").asc)
    vuelo.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** J2 join-key policy: the reference dedups per `cod_vuelo` but joins on
    * `cod_avion`, relying on Beam AsDict's undefined collision behavior if
    * one avion serves several vuelos (SURVEY §2.3 J2). We make the rule
    * explicit and deterministic: after the W1 dedup, keep one row per
    * `cod_avion` (lowest `cod_vuelo` wins), guaranteeing join output
    * cardinality == fact cardinality.
    */
  def dedupFlightsForJoin(vuelo: DataFrame): DataFrame = {
    val w = Window.partitionBy("cod_avion").orderBy(col("cod_vuelo").asc, col("cod_tripulacion").asc)
    dedupFlights(vuelo)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** One passenger row per `dni` — the same cardinality guard
    * [[dedupFlightsForJoin]] gives the vuelo side: the reference's Beam
    * `AsDict` collapses duplicate keys nondeterministically
    * (dict-constructor last-wins over an unordered collection,
    * datalake_to_mart.py:76), so duplicate dni rows here would fan out
    * the fact table and double-count every per-flight quota downstream.
    * Deterministic total order over the remaining columns picks the
    * survivor.
    */
  def dedupPassengersForJoin(pasajero: DataFrame): DataFrame = {
    val others = pasajero.columns.filterNot(_ == "dni").sorted.map(col(_).asc)
    val w = Window.partitionBy("dni").orderBy(others.toSeq: _*)
    pasajero.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** Full mart: takes the three lake tables, returns the 21-column mart
    * (compensacion NULL). Join semantics are left-outer — a venta row with
    * an unknown dni/cod_avion survives with null dim columns
    * (datalake_to_mart.py:78-86 logs the miss and keeps the row).
    */
  def build(venta: DataFrame, pasajero: DataFrame, vuelo: DataFrame): DataFrame = {
    val joined = venta
      .join(broadcast(dedupPassengersForJoin(pasajero)), Seq("dni"), "left")
      .join(broadcast(dedupFlightsForJoin(vuelo)), Seq("cod_avion"), "left")
      .withColumn("monto", abs(col("monto")))
      .withColumn("nombre_completo", obfuscate_name(col("nombre_completo")))
      .withColumn("compensacion", lit(null).cast("string"))
    joined.select(AirlineSchemas.martColumns.map(col): _*)
  }
}

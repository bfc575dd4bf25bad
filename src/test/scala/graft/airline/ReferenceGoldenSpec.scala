package graft.airline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden parity test on the reference's OWN data files
  * (`/root/reference/data_files/`, 8+8+11 CSV rows — read-only).
  * Asserts the end-to-end mart the reference's pipelines would produce,
  * covering every §1.5 dirty-data case with the real inputs. Skips when
  * the reference checkout isn't present (repo stays standalone).
  */
class ReferenceGoldenSpec extends AnyFunSuite with SparkSpec {

  private val dataDir = "/root/reference/data_files"

  private def available = new java.io.File(s"$dataDir/pasajero.csv").exists()

  test("reference 27-row dataset: ingest -> mart -> compensation parity") {
    assume(available, s"$dataDir not present; skipping")
    AirlinePipeline.run(spark, dataDir, asOfYear = 2026)

    assert(spark.table("lake_pasajero").count() == 8)
    assert(spark.table("lake_vuelo").count() == 8)
    assert(spark.table("lake_venta").count() == 11)

    // dirty INTEGER: +-prefixed phones all coerced
    assert(spark.table("lake_pasajero").where(col("telefono") === 56943657435L).count() == 8)

    val mart = spark.table("lake_schema_prod").cache()
    assert(mart.count() == 11)
    assert(mart.columns.toSeq == AirlineSchemas.martColumns)

    // S1: the CANCELACION's -69000.00 normalized; every monto is 69000
    assert(mart.where(col("monto") =!= 69000.0).count() == 0)

    // S2 on real names
    val names = mart.select("dni", "nombre_completo").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(names("50222525-1") == "Lane W**** *****")
    assert(names("45064893-0") == "Burton M***** ******")
    assert(names("29635081-8") == "Sean L***** ********") // keep-char 'L' is case-sensitive: the 'l' in Maichols is starred

    // J1 left-outer: venta.csv:9's dni has no pasajero row
    assert(names("50222775-5") == null)

    // W1+J2: deduped flight attrs joined by avion — LA2546 keeps crew 0245,
    // LA2545 keeps crew 0271 (min cod_tripulacion per flight)
    val crews = mart.select("cod_avion", "cod_tripulacion", "cod_vuelo").distinct().collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(crews("000000000126") == ("0245", "LA2546"))
    assert(crews("000000000125") == ("0271", "LA2545"))

    // S3/S4: date + timestamp coercion from slash / compact formats
    assert(mart.where(col("fecha_de_nacimiento") === "1947-10-12").count() > 0)
    assert(mart.where(col("fecha_compra") === "2020-10-26 00:00:00").count() == 1)

    // compensation: every flight has < 20 sales -> quota floor(n/20)*3 = 0
    // -> no row is ever touched (faithful to the reference's quota rule)
    assert(mart.where(col("compensacion").isNotNull).count() == 0)

    Seq("lake_pasajero", "lake_vuelo", "lake_venta", "lake_schema_prod")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}

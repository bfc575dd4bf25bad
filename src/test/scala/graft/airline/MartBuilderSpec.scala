package graft.airline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the mart build (reference pipeline 2) on fixtures that
  * encode every dirty-data case of SURVEY §1.5: missing join key, negative
  * monto, duplicate flights, 1:N avion↔vuelo ambiguity.
  */
class MartBuilderSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def pasajero: DataFrame = Seq(
    ("11111111-1", "Lane Weber Obama", "nn@gmail.com", "fake street 123, evergreen", 56943657435L, "1947-10-12"),
    ("22222222-2", "Mia Kid Example", "nn@gmail.com", "other street 9", 56911111111L, "2017-03-04")
  ).toDF("dni", "nombre_completo", "correo_electronico", "direccion", "telefono", "fecha_de_nacimiento")
    .withColumn("fecha_de_nacimiento", to_date(col("fecha_de_nacimiento")))

  private def vuelo: DataFrame = Seq(
    ("126", "00097", "0276", "0098", "LA2546", "11:00:00", "22:00:00"),
    ("126", "00120", "0245", "0098", "LA2546", "11:00:00", "22:00:00"), // dup cod_vuelo, lower crew
    ("125", "00100", "0271", "0098", "LA2545", "17:00:00", "16:00:00"),
    ("127", "00100", "0300", "0098", "LA9999", "08:00:00", "09:00:00"),
    ("127", "00101", "0299", "0098", "LA8888", "09:00:00", "10:00:00") // same avion, second vuelo
  ).toDF(AirlineSchemas.vuelo.fieldNames.toSeq: _*)

  private def venta: DataFrame = Seq(
    ("0037", "126", "A36", "11111111-1", 69000.0, "VENTA", "2020-10-19 00:00:00", "2020-10-20 00:00:00", "ECONOMIC"),
    ("0037", "126", "A37", "22222222-2", -69000.0, "CANCELACION", "2020-10-19 00:00:00", "2020-10-20 00:00:00", "VIP"),
    ("0037", "125", "B01", "99999999-9", 10000.0, "VENTA", "2020-10-19 00:00:00", "2020-10-20 00:00:00", "PREMIUM"),
    ("0037", "127", "C01", "11111111-1", 5000.0, "VENTA", "2020-10-19 00:00:00", "2020-10-20 00:00:00", "ECONOMIC")
  ).toDF("codigo_aerolinea", "cod_avion", "asiento", "dni", "monto", "estado", "fecha_reserva", "fecha_compra", "categoria")
    .withColumn("fecha_reserva", to_timestamp(col("fecha_reserva")))
    .withColumn("fecha_compra", to_timestamp(col("fecha_compra")))

  private lazy val mart = MartBuilder.build(venta, pasajero, vuelo).cache()

  test("mart has 21 columns in reference order and fact-side cardinality") {
    assert(mart.columns.toSeq == AirlineSchemas.martColumns)
    assert(mart.count() == 4) // left-outer joins never change fact row count
  }

  test("W1 dedup: one flight per cod_vuelo, lowest cod_tripulacion wins") {
    val d = MartBuilder.dedupFlights(vuelo)
    assert(d.count() == 4)
    val la2546 = d.where($"cod_vuelo" === "LA2546").collect()
    assert(la2546.length == 1)
    assert(la2546.head.getAs[String]("cod_tripulacion") == "0245")
  }

  test("J2 policy: one dim row per join key cod_avion even when 1:N vuelos") {
    val d = MartBuilder.dedupFlightsForJoin(vuelo)
    assert(d.count() == 3)
    // avion 127 serves LA8888 and LA9999; lowest cod_vuelo wins
    assert(d.where($"cod_avion" === "127").head().getAs[String]("cod_vuelo") == "LA8888")
  }

  test("J1 policy: duplicate dni never fans out the fact table") {
    // the reference's AsDict collapses duplicate keys nondeterministically;
    // the engine must pick deterministically and keep fact cardinality
    val dupped = pasajero.unionByName(Seq(
      ("11111111-1", "A Different Name", "zz@gmail.com", "aaa street 1", 56900000000L, "1950-01-01"))
      .toDF("dni", "nombre_completo", "correo_electronico", "direccion", "telefono", "fecha_de_nacimiento")
      .withColumn("fecha_de_nacimiento", to_date(col("fecha_de_nacimiento"))))
    val m = MartBuilder.build(venta, dupped, vuelo)
    assert(m.count() == 4) // unchanged: one dim row per dni joined
    // deterministic survivor: smallest by the sorted-columns total order —
    // correo_electronico sorts first alphabetically, "nn@..." < "zz@...",
    // so the original row wins regardless of union order
    val kept = m.where($"dni" === "11111111-1" && $"cod_avion" === "126")
      .head().getAs[String]("nombre_completo")
    assert(kept == "Lane W**** *****")
  }

  test("J1 left-outer: unknown dni keeps fact row with null dim columns") {
    val miss = mart.where($"dni" === "99999999-9").collect()
    assert(miss.length == 1)
    assert(miss.head.getAs[String]("nombre_completo") == null)
    assert(miss.head.getAs[String]("cod_vuelo") == "LA2545") // vuelo side still joined
  }

  test("S1 abs: CANCELACION negative monto normalized") {
    assert(mart.where($"estado" === "CANCELACION").head().getAs[Double]("monto") == 69000.0)
  }

  test("S2 obfuscation applied to joined passenger name") {
    val r = mart.where($"dni" === "11111111-1" && $"cod_avion" === "126").head()
    assert(r.getAs[String]("nombre_completo") == "Lane W**** *****")
  }

  test("compensacion starts NULL") {
    assert(mart.where($"compensacion".isNotNull).count() == 0)
  }
}

package graft.airline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test: CSV files (with every §1.5 quirk) → lake →
  * mart → compensated mart, through the public pipeline entry point.
  */
class AirlinePipelineSpec extends AnyFunSuite with SparkSpec {

  private def writeFixtures(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toFile
    def put(name: String, content: String): Unit = {
      val w = new java.io.FileWriter(new java.io.File(dir, name))
      w.write(content); w.close()
    }
    // CRLF, no trailing newline, dirty phone, slash dates, comma in address
    put("pasajero.csv",
      "10000000-1|Lane Weber Obama|nn@gmail.com|fake street 1, apt 2|+56911111111|1947/10/12\r\n" +
      "20000000-2|Kid Person Junior|nn@gmail.com|fake street 2|+56922222222|2017/03/04\r\n" +
      "30000000-3|Mid Ager Adult|nn@gmail.com|fake street 3|+56933333333|1985/07/20")
    // duplicate cod_vuelo rows (crew 0276 vs 0245), arrival<departure row
    put("vuelo.csv",
      "126|00097|0276|0098|LA2546|11:00:00|22:00:00\r\n" +
      "126|00120|0245|0098|LA2546|11:00:00|22:00:00\r\n" +
      "125|00100|0271|0098|LA2545|17:00:00|16:00:00")
    // 21 sales on avion 126 (quota 3), one missing dni, one negative CANCELACION
    val sales = (1 to 19).map(i =>
      f"0037|126|A$i%02d|10000000-1|69000.00|VENTA|20201019 00:00:00|20201020 00:00:00|ECONOMIC")
      .mkString("\r\n")
    put("venta.csv",
      sales + "\r\n" +
      "0037|126|B01|20000000-2|-69000.00|CANCELACION|20201019 00:00:00|20201020 00:00:00|VIP\r\n" +
      "0037|126|B02|30000000-3|10000.00|VENTA|20201019 00:00:00|20201020 00:00:00|PREMIUM\r\n" +
      "0037|125|C01|99999999-9|5000.00|VENTA|20201019 00:00:00|20201020 00:00:00|ECONOMIC")
    dir.getAbsolutePath
  }

  test("ingest -> mart -> compensation end to end") {
    AirlinePipeline.run(spark, writeFixtures(), asOfYear = 2026)

    val lake = spark.table("lake_pasajero")
    assert(lake.count() == 3)
    assert(lake.where(col("telefono") === 56911111111L).count() == 1)

    val mart = spark.table("lake_schema_prod")
    assert(mart.count() == 22)
    assert(mart.columns.toSeq == AirlineSchemas.martColumns)
    // dedup picked crew 0245; all avion-126 rows carry it
    assert(mart.where(col("cod_avion") === "126" && col("cod_tripulacion") === "0245").count() === 21)
    // abs applied
    assert(mart.agg(min("monto")).head().getDouble(0) > 0)
    // obfuscation applied post-join
    assert(mart.where(col("dni") === "10000000-1").head().getAs[String]("nombre_completo")
      == "Lane W**** *****")
    // missing dni row survived
    assert(mart.where(col("dni") === "99999999-9").count() == 1)

    // compensation: avion 126 = flight LA2546 has 21 rows -> quota 3.
    // eligible: age 79 (19 rows) + age 9 (1 row); mid-ager gets NO APLICA
    val byComp = mart.groupBy("compensacion").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(byComp.getOrElse(Compensation.Asiento, 0L) == 3) // first 3 eligible by dni
    assert(byComp.getOrElse(Compensation.NoAplica, 0L) == 1)
    assert(byComp.getOrElse("NULL", 0L) == 18) // 17 beyond quota + kid + missing-dni flight
    Seq("lake_pasajero", "lake_vuelo", "lake_venta", "lake_schema_prod")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}

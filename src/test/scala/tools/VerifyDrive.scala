package tools

/** Throwaway verification driver: exercises the airline pipeline
  * (ingest → mart → compensation) through the public API on inline rows
  * mirroring the reference's data_files CSV quirks.
  */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.EngineSession.local("4", "verify-drive")
    import org.apache.spark.sql.functions._

    // --- ingest: pipe-delimited headerless CRLF CSV with dirty data ---
    val dir = java.nio.file.Files.createTempDirectory("graft-drive").toFile
    val pasCsv = new java.io.File(dir, "pasajero.csv")
    val w = new java.io.FileWriter(pasCsv)
    // CRLF rows, no trailing newline, +-prefixed telefono, slash dates
    w.write("11111111-1|Lane Weber Obama|lane@x.com|Calle 1|+56943657435|1947/10/12\r\n" +
            "22222222-2|Solo|solo@x.com|Calle 2|+56911111111|2015/01/02\r\n" +
            "33333333-3|Ana Maria Rios|ana@x.com|Calle 3|bad-phone|1990/06/30")
    w.close()
    val pas = graft.sources.PipeDelimitedSource.read(
      spark, pasCsv.getAbsolutePath, graft.airline.AirlineSchemas.pasajero)
    println("=== ingest (pasajero) ===")
    pas.show(false)

    val vuelo = spark.createDataFrame(Seq(
      ("126", "200", "T9", "P1", "LA2546", "10:00", "12:00"),
      ("126", "100", "T1", "P1", "LA2546", "10:00", "12:00"), // dup cod_vuelo
      ("125", "150", "T5", "P2", "LA2545", "17:00", "16:00")
    )).toDF(graft.airline.AirlineSchemas.vuelo.fieldNames: _*)

    val venta = spark.createDataFrame(Seq(
      ("LA", "126", "1A", "11111111-1", 69000.0, "VENTA", "2020-10-19 00:00:00", "2020-10-19 00:00:00", "ECONOMIC"),
      ("LA", "126", "1B", "22222222-2", -69000.0, "CANCELACION", "2020-10-19 00:00:00", "2020-10-19 00:00:00", "VIP"),
      ("LA", "125", "2A", "99999999-9", 10000.0, "VENTA", "2020-10-19 00:00:00", "2020-10-19 00:00:00", "PREMIUM") // unknown dni
    )).toDF("codigo_aerolinea", "cod_avion", "asiento", "dni", "monto", "estado", "fecha_reserva", "fecha_compra", "categoria")
      .withColumn("fecha_reserva", to_timestamp(col("fecha_reserva")))
      .withColumn("fecha_compra", to_timestamp(col("fecha_compra")))

    val mart = graft.airline.MartBuilder.build(venta, pas, vuelo)
    println("=== mart ===")
    mart.select("cod_avion", "dni", "monto", "nombre_completo", "cod_tripulacion", "compensacion").show(false)
    mart.explain("formatted")

    val comp = graft.airline.Compensation(
      // inflate to 21 sales on one flight so quota floor(21/20)*3 = 3
      mart.unionByName(Seq.fill(20)(mart.where(col("cod_avion") === "126").limit(1)).reduce(_ union _)),
      asOfYear = 2026)
    println("=== compensation ===")
    comp.groupBy("cod_vuelo", "compensacion").count().show(false)
    spark.stop()
  }
}

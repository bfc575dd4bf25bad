package graft.airline

import org.apache.spark.sql.types._

/** The reference's four table schemas (SURVEY §1.4), as Spark StructTypes.
  *
  * These mirror `/root/reference/resources/{pasajero,vuelo,venta,
  * schema_prod}.json` under the BQ→Spark type mapping of SURVEY §1.3
  * (STRING→String, INTEGER→Long, FLOAT→Double, DATE→Date,
  * TIMESTAMP→Timestamp). They can equivalently be produced by feeding the
  * original JSON through [[graft.schema.BqSchema.parse]]; they are inlined
  * here so the airline module has no runtime dependency on reference files.
  */
object AirlineSchemas {

  val pasajero: StructType = StructType(Seq(
    StructField("dni", StringType),
    StructField("nombre_completo", StringType),
    StructField("correo_electronico", StringType),
    StructField("direccion", StringType),
    StructField("telefono", LongType),
    StructField("fecha_de_nacimiento", DateType)
  ))

  val vuelo: StructType = StructType(Seq(
    StructField("cod_avion", StringType),
    StructField("capacidad", StringType),
    StructField("cod_tripulacion", StringType),
    StructField("cod_piloto", StringType),
    StructField("cod_vuelo", StringType),
    StructField("horario_salida", StringType),
    StructField("horario_llegada", StringType)
  ))

  val venta: StructType = StructType(Seq(
    StructField("codigo_aerolinea", StringType),
    StructField("cod_avion", StringType),
    StructField("asiento", StringType),
    StructField("dni", StringType),
    StructField("monto", DoubleType),
    StructField("estado", StringType),
    StructField("fecha_reserva", TimestampType),
    StructField("fecha_compra", TimestampType),
    StructField("categoria", StringType)
  ))

  /** Mart = venta(9) + vuelo non-key(6) + pasajero non-key(5) +
    * compensacion (resources/schema_prod.json:1-107). Column order follows
    * the reference mart schema.
    */
  val martColumns: Seq[String] = Seq(
    "codigo_aerolinea", "cod_avion", "asiento", "dni", "monto", "estado",
    "fecha_reserva", "fecha_compra", "categoria",
    "capacidad", "cod_tripulacion", "cod_piloto", "cod_vuelo",
    "horario_salida", "horario_llegada",
    "nombre_completo", "correo_electronico", "direccion", "telefono",
    "fecha_de_nacimiento", "compensacion"
  )
}

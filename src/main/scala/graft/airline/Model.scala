package graft.airline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed views of the airline domain (`Dataset[T]` surface).
  *
  * The engine's core is DataFrame (schemas are externally declared JSON —
  * SURVEY §1.2 — so dynamic by nature), but typed views are provided where
  * compile-time safety helps library consumers: per-row business logic,
  * pattern matching, and tests. Conversions are zero-copy plan-wise
  * (an `as[T]` analysis-time cast, not a scan).
  */
object Model {

  case class Pasajero(
      dni: String,
      nombre_completo: String,
      correo_electronico: String,
      direccion: String,
      telefono: Option[Long],
      fecha_de_nacimiento: Option[java.sql.Date])

  case class Vuelo(
      cod_avion: String,
      capacidad: String,
      cod_tripulacion: String,
      cod_piloto: String,
      cod_vuelo: String,
      horario_salida: String,
      horario_llegada: String)

  case class Venta(
      codigo_aerolinea: String,
      cod_avion: String,
      asiento: String,
      dni: String,
      monto: Option[Double],
      estado: String,
      fecha_reserva: Option[java.sql.Timestamp],
      fecha_compra: Option[java.sql.Timestamp],
      categoria: String)

  def pasajeros(spark: SparkSession, df: DataFrame): Dataset[Pasajero] = {
    import spark.implicits._
    df.as[Pasajero]
  }

  def vuelos(spark: SparkSession, df: DataFrame): Dataset[Vuelo] = {
    import spark.implicits._
    df.as[Vuelo]
  }

  def ventas(spark: SparkSession, df: DataFrame): Dataset[Venta] = {
    import spark.implicits._
    df.as[Venta]
  }
}

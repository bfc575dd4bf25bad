package graft.airline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("typed views round-trip the airline schemas, nulls become Options") {
    val df = Seq(
      ("1-1", "Ann Lee", "a@x", "s1", Some(56911111111L), Some("1990-01-31")),
      ("2-2", "Bob Roe", "b@x", "s2", None, None)
    ).toDF("dni", "nombre_completo", "correo_electronico", "direccion", "telefono", "d")
      .withColumn("fecha_de_nacimiento", to_date(col("d"))).drop("d")

    val ds = Model.pasajeros(spark, df)
    val rows = ds.collect().sortBy(_.dni)
    assert(rows(0).telefono.contains(56911111111L))
    assert(rows(1).telefono.isEmpty && rows(1).fecha_de_nacimiento.isEmpty)

    // typed transforms compose with the relational plan
    val adults = ds.filter(p => p.fecha_de_nacimiento.exists(_.toString < "2000-01-01"))
    assert(adults.count() == 1)
  }
}

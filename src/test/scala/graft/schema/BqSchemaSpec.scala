package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class BqSchemaSpec extends AnyFunSuite {

  test("parses a reference-style field list with the §1.3 type mapping") {
    val json =
      """[
        {"name": "dni", "type": "STRING", "mode": "NULLABLE"},
        {"name": "telefono", "type": "INTEGER", "mode": "NULLABLE"},
        {"name": "monto", "type": "FLOAT"},
        {"name": "fecha_de_nacimiento", "type": "DATE"},
        {"name": "fecha_reserva", "type": "TIMESTAMP"}
      ]"""
    val st = BqSchema.parse(json)
    assert(st == StructType(Seq(
      StructField("dni", StringType),
      StructField("telefono", LongType),
      StructField("monto", DoubleType),
      StructField("fecha_de_nacimiento", DateType),
      StructField("fecha_reserva", TimestampType))))
  }

  test("accepts the {fields: ...} wrapper the reference builds at load time") {
    val st = BqSchema.parse("""{"fields": [{"name": "x", "type": "BOOL"}]}""")
    assert(st.head.dataType == BooleanType)
  }

  test("REQUIRED -> non-nullable; REPEATED -> array") {
    val st = BqSchema.parse(
      """[{"name": "a", "type": "STRING", "mode": "REQUIRED"},
         {"name": "b", "type": "FLOAT64", "mode": "REPEATED"}]""")
    assert(!st("a").nullable)
    assert(st("b").dataType == ArrayType(DoubleType))
  }

  test("RECORD recurses") {
    val st = BqSchema.parse(
      """[{"name": "r", "type": "RECORD", "fields": [{"name": "y", "type": "INT64"}]}]""")
    assert(st("r").dataType == StructType(Seq(StructField("y", LongType))))
  }

  test("unknown type raises") {
    assertThrows[IllegalArgumentException](BqSchema.parse("""[{"name":"x","type":"GEOGRAPHY"}]"""))
  }
}

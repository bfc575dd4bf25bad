package graft.schema

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Parser for BigQuery-style JSON schema field lists → Spark [[StructType]].
  *
  * The reference declares every table schema as an external JSON array of
  * `{"name": ..., "type": ..., "mode": ...}` objects (see
  * `/root/reference/resources/pasajero.json:1-32` and the loader at
  * `/root/reference/src/data_ingest.py:28-33`). Only five primitive types
  * appear across the reference's four schemas (SURVEY §1.3); the mapping
  * below covers them plus the remaining BigQuery primitives for
  * completeness.
  *
  * Type mapping (SURVEY §1.3):
  *   STRING→StringType, INTEGER/INT64→LongType, FLOAT/FLOAT64→DoubleType,
  *   DATE→DateType, TIMESTAMP→TimestampType, BOOLEAN/BOOL→BooleanType,
  *   NUMERIC→DecimalType(38,9), BYTES→BinaryType.
  * Mode: REQUIRED→nullable=false, NULLABLE/REPEATED-absent→nullable=true,
  * REPEATED→ArrayType(element). RECORD/STRUCT recurse on "fields".
  */
object BqSchema {

  def parse(json: String): StructType = {
    val root = JsonMethods.parse(json) match {
      // Accept both a bare array and the {"fields": [...]} wrapper the
      // reference builds at load time (data_ingest.py:31-33).
      case JObject(fields) =>
        fields.collectFirst { case ("fields", arr: JArray) => arr }
          .getOrElse(throw new IllegalArgumentException("no 'fields' key"))
      case arr: JArray => arr
      case other =>
        throw new IllegalArgumentException(s"unexpected schema JSON: $other")
    }
    StructType(root.arr.map(parseField))
  }

  private def parseField(v: JValue): StructField = {
    val obj = v.asInstanceOf[JObject].obj.toMap
    val name = str(obj, "name")
    val mode = obj.get("mode").collect { case JString(s) => s.toUpperCase }
      .getOrElse("NULLABLE")
    val base = str(obj, "type").toUpperCase match {
      case "STRING"              => StringType
      case "INTEGER" | "INT64"   => LongType
      case "FLOAT" | "FLOAT64"   => DoubleType
      case "DATE"                => DateType
      case "TIMESTAMP"           => TimestampType
      case "DATETIME"            => TimestampNTZType
      case "BOOLEAN" | "BOOL"    => BooleanType
      case "NUMERIC"             => DecimalType(38, 9)
      case "BYTES"               => BinaryType
      case "RECORD" | "STRUCT" =>
        StructType(obj("fields").asInstanceOf[JArray].arr.map(parseField))
      case other =>
        throw new IllegalArgumentException(s"unsupported BQ type: $other")
    }
    val (dt, nullable) = mode match {
      case "REPEATED" => (ArrayType(base), true)
      case "REQUIRED" => (base, false)
      case _          => (base, true)
    }
    StructField(name, dt, nullable)
  }

  private def str(obj: Map[String, JValue], key: String): String =
    obj.get(key) match {
      case Some(JString(s)) => s
      case _ => throw new IllegalArgumentException(s"missing '$key'")
    }
}

package graft.sources

import graft.SparkSpec
import graft.airline.AirlineSchemas
import org.scalatest.funsuite.AnyFunSuite

/** Ingest format contract (SURVEY §1.5): pipe-delimited, headerless, CRLF
  * line endings, no trailing newline, dirty INTEGER values, slash dates,
  * compact timestamps.
  */
class PipeDelimitedSourceSpec extends AnyFunSuite with SparkSpec {

  private def write(content: String): String = {
    val f = java.io.File.createTempFile("graft-src", ".csv")
    f.deleteOnExit()
    val w = new java.io.FileWriter(f)
    w.write(content); w.close()
    f.getAbsolutePath
  }

  test("CRLF rows without trailing newline all parse; commas are data") {
    val path = write(
      "1-1|Ann Lee|a@x.com|street 1, unit 2|+56911111111|1990/01/31\r\n" +
      "2-2|Bob Roe|b@x.com|street 2|+56922222222|2001/12/05")
    val df = PipeDelimitedSource.read(spark, path, AirlineSchemas.pasajero)
    assert(df.count() == 2)
    val r = df.where(df("dni") === "1-1").head()
    assert(r.getAs[String]("direccion") == "street 1, unit 2")
    assert(r.getAs[java.sql.Date]("fecha_de_nacimiento").toString == "1990-01-31")
  }

  test("dirty INTEGER policy: non-digits stripped, sign kept, no digits -> null") {
    val path = write(
      "1-1|A|a@x|s|+56943657435|1990/01/01\r\n" +
      "2-2|B|b@x|s|phone-unknown|1990/01/01\r\n" +
      "3-3|C|c@x|s||1990/01/01\r\n" +
      "4-4|D|d@x|s|+56 9 4365-7435|1990/01/01\r\n" +
      "5-5|E|e@x|s|-1 234|1990/01/01")
    val df = PipeDelimitedSource.read(spark, path, AirlineSchemas.pasajero)
    val tel = df.orderBy("dni").collect().map(r =>
      if (r.isNullAt(4)) null else Long.box(r.getLong(4)))
    assert(tel.toSeq == Seq(
      Long.box(56943657435L), null, null,
      Long.box(56943657435L), Long.box(-1234L)))
  }

  test("dirty INTEGER overflow -> null, not an ANSI ArithmeticException") {
    // two concatenated phone numbers strip to 20+ digits — over Long
    // range; a plain ANSI cast would kill the whole ingest on one cell
    val path = write(
      "1-1|A|a@x|s|+56 9 1111 1111 / +56 9 2222 2222|1990/01/01\r\n" +
      "2-2|B|b@x|s|+56943657435|1990/01/01")
    val df = PipeDelimitedSource.read(spark, path, AirlineSchemas.pasajero)
    val tel = df.orderBy("dni").collect().map(r =>
      if (r.isNullAt(4)) null else Long.box(r.getLong(4)))
    assert(tel.toSeq == Seq(null, Long.box(56943657435L)))
  }

  test("compact timestamps and ISO both coerce") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("ts", TimestampType)))
    val path = write("a|20201019 10:30:00\r\nb|2021-05-06 07:08:09")
    val df = PipeDelimitedSource.read(spark, path, schema)
    val ts = df.orderBy("id").collect().map(_.getTimestamp(1).toString)
    assert(ts.toSeq == Seq("2020-10-19 10:30:00.0", "2021-05-06 07:08:09.0"))
  }

  test("malformed date -> null, not failure") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("d", DateType)))
    val df = PipeDelimitedSource.read(spark, write("a|not-a-date"), schema)
    assert(df.head().isNullAt(1))
  }
}

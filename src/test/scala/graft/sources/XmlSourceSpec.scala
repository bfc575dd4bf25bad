package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class XmlSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-xml-$tag").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(d)
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("roundtrip survives markup characters, newlines, and surrounding whitespace") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "a <tag> & an &amp; entity"),
      (3L, "line one\nline two"),
      (4L, " leading and trailing "),
      (5L, "quotes \" and ' inside"))
    val dir = tmp("rt")
    XmlSource.write(rows.toDF("id", "s"), dir)
    val back = XmlSource.read(spark, dir, schema)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)
  }

  test("on-disk form is escaped XML under the row/root tags") {
    val dir = tmp("dialect")
    XmlSource.write(Seq((1L, "a <b> & c")).toDF("id", "s"), dir,
      rowTag = "doc", rootTag = "corpus")
    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part") && !f.getName.endsWith(".crc")).head
    val raw = new String(java.nio.file.Files.readAllBytes(part.toPath), "UTF-8")
    assert(raw.contains("<corpus>") && raw.contains("<doc>"), raw)
    // `<` and `&` must escape; a bare `>` is legal XML and stays raw
    assert(raw.contains("a &lt;b> &amp; c"), raw)
  }

  test("null fields are absent elements and come back null") {
    val dir = tmp("nulls")
    XmlSource.write(Seq((1L, null: String), (2L, "x")).toDF("id", "s"), dir)
    val back = XmlSource.read(spark, dir, schema)
      .select("id", "s").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(back == Set((1L, None), (2L, Some("x"))))
  }

  test("permissive read quarantines malformed records; strict read fails") {
    val dir = tmp("corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.xml"),
      "<rows><row><id>1</id><s>ok</s></row><row><id>not_a_number</id><s>bad</s></row></rows>")
    val back = XmlSource.read(spark, dir, schema)
    val good = back.where($"_corrupt_record".isNull)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "ok")))
    // data columns ALONGSIDE the corrupt column (Spark rejects
    // corrupt-column-only projections over raw XML — same caveat as CSV)
    assert(back.where($"_corrupt_record".isNotNull)
      .select("id", "_corrupt_record").collect().length == 1)
    intercept[Exception] {
      XmlSource.readStrict(spark, dir, schema).collect()
    }
  }

  test("column pruning reaches the XML scan") {
    val dir = tmp("prune")
    XmlSource.write(Seq((1L, "x")).toDF("id", "s"), dir)
    val plan = XmlSource.read(spark, dir, schema).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("s#"), plan)
  }
}

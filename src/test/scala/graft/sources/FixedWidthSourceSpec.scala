package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class FixedWidthSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def scratch(tag: String) = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(d)
    d.getAbsolutePath
  }

  test("roundtrip: typed columns through positional fields; empty cell becomes NULL") {
    val dir = scratch("fw_rt_")
    val df = Seq((1L, "A", 12345L), (2L, null.asInstanceOf[String], -7L))
      .toDF("id", "tag", "amt")
    FixedWidthSource.write(df, dir, Seq("id" -> 4, "tag" -> 3, "amt" -> 8))
    val back = FixedWidthSource.read(spark, dir, Seq(
        ("id", 4, LongType), ("tag", 3, StringType), ("amt", 8, LongType)))
      .as[(Long, Option[String], Long)].collect().toSet
    assert(back == Set((1L, Some("A"), 12345L), (2L, None, -7L)))
  }

  test("overflow REFUSES with the offending column and value — never truncates") {
    val dir = scratch("fw_of_")
    val df = Seq((123456L, "ok")).toDF("id", "tag")
    val e = intercept[Exception] {
      FixedWidthSource.write(df, dir, Seq("id" -> 4, "tag" -> 3))
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("overflow") && msg.contains("id") && msg.contains("123456"),
      s"unexpected error: $msg")
  }

  test("embedded line breaks are rejected — the record frame is the line") {
    val dir = scratch("fw_nl_")
    val df = Seq(("a\nb", 1L)).toDF("tag", "id")
    val e = intercept[Exception] {
      FixedWidthSource.write(df, dir, Seq("tag" -> 8, "id" -> 4))
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("line break"), s"unexpected error: $msg")
  }

  test("documented edge-space loss: data spaces at field edges trim away on read") {
    val dir = scratch("fw_sp_")
    val df = Seq((" pad ", 1L)).toDF("tag", "id")
    FixedWidthSource.write(df, dir, Seq("tag" -> 8, "id" -> 4))
    val back = FixedWidthSource.read(spark, dir, Seq(
        ("tag", 8, StringType), ("id", 4, LongType)))
      .as[(String, Long)].collect().toList
    assert(back == List(("pad", 1L)))
  }
}

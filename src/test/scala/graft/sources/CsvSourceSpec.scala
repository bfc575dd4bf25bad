package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CsvSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-csv-$tag").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(d)
    d.getAbsolutePath
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("roundtrip survives separators, quotes, and doubled quotes in data") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" word"),
      (4L, "edge\"\"doubling, and, more"),
      (5L, "trailing space "))
    val dir = tmp("rt")
    CsvSource.write(rows.toDF("id", "s"), dir)
    val back = CsvSource.read(spark, dir, schema)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)
  }

  test("on-disk dialect is RFC 4180: quotes double, never backslash-escape") {
    val dir = tmp("dialect")
    CsvSource.write(Seq((1L, "say \"hi\", now")).toDF("id", "s"), dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).head
    val raw = new String(java.nio.file.Files.readAllBytes(part.toPath), "UTF-8")
    assert(raw.contains("\"say \"\"hi\"\", now\""), raw)
    assert(!raw.contains("\\\""), raw)
  }

  test("permissive read quarantines malformed lines; strict read fails") {
    val dir = tmp("corrupt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "id,s\n1,ok\nnot_a_number,\"unclosed quote\n")
    // reference data columns ALONGSIDE the corrupt column (Spark rejects
    // corrupt-column-only projections over raw CSV — same caveat as the
    // JSONL reader documents)
    val rows = CsvSource.read(spark, dir, schema)
      .select("id", "s", "_corrupt_record").collect()
    val good = rows.filter(_.isNullAt(2)).map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSeq == Seq((1L, "ok")))
    assert(rows.count(!_.isNullAt(2)) == 1)
    intercept[Exception] {
      CsvSource.readStrict(spark, dir, schema).collect()
    }
  }

  test("readMultiLine parses quoted embedded newlines (the non-splittable tier)") {
    val dir = tmp("ml")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      "id,s\n1,\"two\nlines\"\n2,single\n")
    val back = CsvSource.readMultiLine(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "two\nlines"), (2L, "single")))
  }

  test("null handling: a null string comes back null, not the text 'null'") {
    val dir = tmp("null")
    CsvSource.write(Seq((1L, Option("x")), (2L, Option.empty[String]))
      .toDF("id", "s"), dir)
    val back = CsvSource.read(spark, dir, schema)
      .select("id", "s").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(back == Set((1L, Some("x")), (2L, None)))
  }

  test("explicit schema: projection pruning reaches the csv scan") {
    val dir = tmp("prune")
    CsvSource.write(Seq((1L, "a")).toDF("id", "s"), dir)
    val plan = CsvSource.read(spark, dir, schema).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }
}

package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class OrcSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getAbsolutePath
  }

  test("roundtrip preserves values exactly (newlines, unicode, nulls, arrays)") {
    val docs = Seq(
      (0L, "plain ascii text", Seq(1.0f, 2.0f), "en"),
      (1L, "line one\nline two\n\ttabbed \"quoted\"", Seq(3.5f), "en"),
      (2L, "中文文本 with ünïcødé", Seq.empty[Float], "zh"),
      (3L, null.asInstanceOf[String], Seq(0.25f), "und")
    ).toDF("doc_id", "text", "vec", "lang")
    val path = tmpDir("orc_rt")
    OrcSource.write(docs, path)
    val back = OrcSource.read(spark, path, docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("filters push into the ORC scan; projection narrows ReadSchema") {
    val path = tmpDir("orc_push")
    OrcSource.write(
      (0L until 100L).map(i => (i, s"doc $i", i % 7)).toSeq.toDF("doc_id", "text", "k"),
      path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("k", LongType)))
    val q = OrcSource.read(spark, path, schema)
      .where(col("doc_id") > 90L).select("doc_id")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,90)]"),
      physical)
    assert(physical.contains("ReadSchema: struct<doc_id:bigint>"), physical)
    assert(q.count() == 9)
  }

  test("a schema field missing from the files reads as null (documented drift contract)") {
    val path = tmpDir("orc_drift")
    OrcSource.write(Seq((1L, "a")).toDF("doc_id", "text"), path)
    val widened = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("extra", IntegerType)))
    val rows = OrcSource.read(spark, path, widened).collect()
    assert(rows.length == 1 && rows(0).isNullAt(2))
  }

  test("overwrite mode replaces; ErrorIfExists refuses") {
    val path = tmpDir("orc_modes")
    OrcSource.write(Seq((1L, "first")).toDF("doc_id", "text"), path)
    OrcSource.write(Seq((2L, "second")).toDF("doc_id", "text"), path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    assert(OrcSource.read(spark, path, schema).collect().map(_.getLong(0)).toSeq == Seq(2L))
    intercept[Exception] {
      OrcSource.write(Seq((3L, "third")).toDF("doc_id", "text"), path,
        org.apache.spark.sql.SaveMode.ErrorIfExists)
    }
  }
}

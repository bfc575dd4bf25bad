package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonLinesSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getAbsolutePath
  }

  test("roundtrip preserves values exactly (newlines, unicode, numbers)") {
    val docs = Seq(
      (0L, "plain ascii text", "en", 16L),
      (1L, "line one\nline two\n\ttabbed \"quoted\"", "en", 34L),
      (2L, "中文文本 with ünïcødé", "zh", 17L),
      (3L, null.asInstanceOf[String], "und", 0L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val path = tmpDir("jsonl_rt")
    JsonLinesSource.write(docs, path)
    val back = JsonLinesSource.read(spark, path, docs.schema)
      .select("doc_id", "text", "lang", "n_chars")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("gzip roundtrip: .json.gz shards on disk, transparent read, quarantine intact") {
    val docs = Seq(
      (0L, "plain ascii text", "en", 16L),
      (1L, "line one\nline two", "en", 17L),
      (2L, "中文文本 with ünïcødé", "zh", 17L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val path = tmpDir("jsonl_gz")
    JsonLinesSource.writeGzip(docs, path)
    val shards = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    assert(shards.nonEmpty && shards.forall(_.endsWith(".json.gz")), shards.mkString(","))
    val back = JsonLinesSource.read(spark, path, docs.schema)
      .select("doc_id", "text", "lang", "n_chars")
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // the corrupt-line contract survives the codec: append a gzipped
    // garbage shard and read again
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(new java.io.File(path, "part-junk.json.gz")))
    gz.write("not json at all\n".getBytes("UTF-8")); gz.close()
    // cache first — a corrupt-column-only projection on the raw scan is
    // rejected by Spark (the documented contract)
    val withJunk = JsonLinesSource.read(spark, path, docs.schema).cache()
    try assert(withJunk.where(col("_corrupt_record").isNotNull).count() == 1)
    finally withJunk.unpersist()
  }

  test("corrupt lines are quarantined, not fatal; strict mode fails") {
    val path = tmpDir("jsonl_corrupt")
    new java.io.File(path).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-00000.json"),
      """{"doc_id": 1, "text": "good line"}
        |this is not json at all
        |{"doc_id": 2, "text": "also good"}
        |{"doc_id": 3, "text": "truncated
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val out = JsonLinesSource.read(spark, path, schema).cache()
    try {
      assert(out.where($"_corrupt_record".isNull).count() == 2)
      val bad = out.where($"_corrupt_record".isNotNull)
      // schema fields null on quarantine rows; the raw line is preserved
      assert(bad.where($"doc_id".isNotNull || $"text".isNotNull).count() == 0)
      assert(bad.select("_corrupt_record").as[String].collect().toSet ==
        Set("this is not json at all", """{"doc_id": 3, "text": "truncated"""))
      intercept[org.apache.spark.SparkException] {
        JsonLinesSource.readStrict(spark, path, schema).count()
      }
    } finally out.unpersist()
  }

  test("explicit schema: no inference pass, and pruning reaches the parser") {
    val docs = spark.range(100).select(
      $"id".as("doc_id"), concat(lit("text "), $"id").as("text"),
      lit("en").as("lang"))
    val path = tmpDir("jsonl_prune")
    JsonLinesSource.write(docs, path)
    val pruned = JsonLinesSource.read(spark, path, docs.schema).select("doc_id")
    // the scan's ReadSchema carries only the projected field
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("ReadSchema: struct<doc_id:bigint>"), physical)
    assert(pruned.count() == 100)
  }

  test("read rejects a schema that already contains the corrupt column") {
    val schema = StructType(Seq(StructField("_corrupt_record", StringType)))
    intercept[IllegalArgumentException] {
      JsonLinesSource.read(spark, "/nonexistent", schema)
    }
  }
}

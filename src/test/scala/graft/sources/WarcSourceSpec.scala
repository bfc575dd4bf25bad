package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def record(
      id: String,
      payload: Array[Byte],
      headers: Map[String, String] = Map.empty): Array[Byte] = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    sb.append("WARC-Type: resource\r\n")
    sb.append("WARC-Record-ID: ").append(id).append("\r\n")
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    sb.result().getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("US-ASCII")
  }

  test("parseShard: Content-Length framing carries CRLFs, fake WARC headers, and binary bytes") {
    // payload that LOOKS like a record — framing must not be fooled
    val evil = "WARC/1.0\r\nContent-Length: 3\r\n\r\nxyz\r\n\r\n".getBytes("UTF-8")
    val bin = Array[Byte](0, 1, 2, -1, 13, 10, 13, 10, 0)
    val shard = record("<urn:a>", evil) ++ record("<urn:b>", bin)
    val recs = WarcSource.parseShard(shard).toList
    assert(recs.map(_._2) == List("<urn:a>", "<urn:b>"))
    assert(recs.forall(_._8 == null))
    assert(recs.head._7.toSeq == evil.toSeq)
    assert(recs(1)._7.toSeq == bin.toSeq)
    assert(recs.map(_._6.longValue) == List(evil.length.toLong, bin.length.toLong))
  }

  test("parseShard: multi-byte UTF-8 — Content-Length is bytes, not characters") {
    val payload = "héllo wörld — ￥".getBytes("UTF-8")
    val recs = WarcSource.parseShard(record("<urn:u>", payload)).toList
    assert(recs.head._6.longValue == payload.length.toLong)
    assert(new String(recs.head._7, "UTF-8") == "héllo wörld — ￥")
  }

  test("parseShard: optional headers surface; absent ones are null") {
    val recs = WarcSource.parseShard(record("<urn:h>", "x".getBytes,
      Map("WARC-Target-URI" -> "http://e.com/", "Content-Type" -> "text/plain"))).toList
    val r = recs.head
    assert(r._1 == "resource" && r._3 == "http://e.com/" &&
      r._5 == "text/plain" && r._4 == null)
  }

  test("parseShard: corruption quarantines ONE row and resyncs at the next record") {
    val good = record("<urn:ok>", "fine".getBytes)
    val overrun = "WARC/1.0\r\nWARC-Record-ID: <urn:bad>\r\nContent-Length: 999\r\n\r\nshort"
      .getBytes("UTF-8")
    val recs = WarcSource.parseShard(overrun ++ good).toList
    assert(recs.size == 2)
    assert(recs.head._8 != null && recs.head._8.contains("Content-Length"))
    assert(recs(1)._2 == "<urn:ok>" && recs(1)._8 == null)
    // garbage BETWEEN records quarantines too, without eating the records
    val noise = "not a warc at all\r\n".getBytes("UTF-8")
    val recs2 = WarcSource.parseShard(good ++ noise ++ good).toList
    assert(recs2.count(_._8 == null) == 2 && recs2.count(_._8 != null) == 1)
  }

  test("roundtrip through Spark: byte-exact payloads, one file per non-empty partition") {
    val scratch = java.nio.file.Files.createTempDirectory("warc_spec_").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(scratch)
    val df = Seq(
        (1L, "plain text"),
        (2L, "embedded\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n fake"),
        (3L, "trailing space "))
      .toDF("id", "text").repartition(2)
      .select(concat(lit("<urn:doc:"), col("id"), lit(">")).as("record_id"),
        lit(null).cast("string").as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit("text/plain").as("content_type"),
        encode(col("text"), "UTF-8").as("payload"))
    WarcSource.write(df, scratch.getAbsolutePath)
    val files = scratch.listFiles().filter(_.getName.endsWith(".warc"))
    assert(files.nonEmpty && files.forall(_.getName.startsWith("part-")))
    val back = WarcSource.read(spark, scratch.getAbsolutePath)
      .select(regexp_extract(col("record_id"), "doc:(\\d+)", 1).cast("long"),
        expr("CAST(payload AS STRING)"), col("corrupt"))
      .as[(Long, String, String)].collect().toSet
    assert(back == Set(
      (1L, "plain text", null),
      (2L, "embedded\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n fake", null),
      (3L, "trailing space ", null)))
  }
}

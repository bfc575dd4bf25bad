package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingest ACROSS INVOCATIONS: with a persistent checkpoint,
  * a later run of the same file-source query processes only the files
  * that arrived since the previous run — the "process today's crawl,
  * not the whole corpus" mode recurring ingest jobs need. The in-run
  * multi-batch story is StatefulStreamsSpec's; this is the restart one.
  */
class IncrementalIngestSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("second run with the same checkpoint reads ONLY newly arrived files") {
    val in = java.nio.file.Files.createTempDirectory("graft-incr-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-incr-ck").toString

    def write(ids: Range): Unit =
      ids.map(i => (i.toLong, s"row$i")).toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(in)

    def stream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
      .parquet(in)

    write(0 until 10)
    write(10 until 25)
    val q1 = EventStreams.runToTable(stream(), "incr_tbl", Some(ckpt))
    assert(q1.recentProgress.map(_.numInputRows).sum == 25)
    assert(spark.table("incr_tbl").count() == 25)

    // new arrivals between runs
    write(25 until 31)
    val q2 = EventStreams.runToTable(stream(), "incr_tbl", Some(ckpt))
    // the restarted query reads exactly the new file's rows...
    assert(q2.recentProgress.map(_.numInputRows).sum == 6,
      q2.recentProgress.map(_.numInputRows).mkString(","))
    // ...and the table ends exact — no reprocessing duplicates
    val ids = spark.table("incr_tbl").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 31L))

    // a THIRD run with nothing new moves nothing
    val q3 = EventStreams.runToTable(stream(), "incr_tbl", Some(ckpt))
    assert(q3.recentProgress.map(_.numInputRows).sum == 0)
    assert(spark.table("incr_tbl").count() == 31)
    spark.sql("DROP TABLE IF EXISTS incr_tbl")
  }
}

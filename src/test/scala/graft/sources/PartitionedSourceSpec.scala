package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PartitionedSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType),
    StructField("lang", StringType)))

  private def fixture = Seq(
    (1L, "uno", "en"), (2L, "dos", "en"), (3L, "tres", "de"),
    (4L, "vier", "de"), (5L, "cinq", "fr")).toDF("id", "payload", "lang")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toFile
    org.apache.spark.graft.sparkShims.deleteDirOnExit(d)
    d.getAbsolutePath
  }

  test("roundtrip: partitioned write/read preserves every row and the pinned types") {
    val path = tmpDir("part_rt")
    PartitionedSource.write(fixture, path, Seq("lang"))
    val back = PartitionedSource.read(spark, path, schema)
      .select("id", "payload", "lang")
    assert(back.schema == StructType(schema.fields))
    assert(back.as[(Long, String, String)].collect().toSet ==
      fixture.as[(Long, String, String)].collect().toSet)
  }

  test("a partition-column predicate prunes directories: plan AND file count") {
    val path = tmpDir("part_prune")
    PartitionedSource.write(fixture, path, Seq("lang"))
    val q = PartitionedSource.read(spark, path, schema).where($"lang" === "en")
    val physical = q.queryExecution.executedPlan.toString
    // planning-time claim: the predicate lands in PartitionFilters, not
    // PushedFilters — it eliminates directories before any footer is read
    assert(physical.contains("PartitionFilters:") && physical.contains("lang"), physical)
    assert(q.count() == 2)
    // I/O-level fact: the executed scan touched strictly fewer files
    // than the tree holds
    val scanned = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.get
    val total = PartitionedSource.read(spark, path, schema).inputFiles.length
    assert(scanned < total, s"scanned $scanned of $total files — nothing was pruned")
  }

  test("data-column predicates still push down into the parquet footers") {
    val path = tmpDir("part_push")
    PartitionedSource.write(fixture, path, Seq("lang"))
    val q = PartitionedSource.read(spark, path, schema).where($"id" > 2L).select("id")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"), physical)
    assert(q.as[Long].collect().toSet == Set(3L, 4L, 5L))
  }

  test("overwrite replaces the export; append adds partitions") {
    val path = tmpDir("part_modes")
    PartitionedSource.write(fixture, path, Seq("lang"))
    PartitionedSource.write(Seq((9L, "neuf", "fr")).toDF("id", "payload", "lang"),
      path, Seq("lang"), org.apache.spark.sql.SaveMode.Append)
    val back = PartitionedSource.read(spark, path, schema)
    assert(back.count() == 6)
    PartitionedSource.write(Seq((9L, "neuf", "fr")).toDF("id", "payload", "lang"),
      path, Seq("lang"))
    assert(PartitionedSource.read(spark, path, schema).count() == 1)
  }
}

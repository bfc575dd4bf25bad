package graft.airline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.BqSchema
import graft.sources.PipeDelimitedSource

/** End-to-end airline workflow — the reference's three pipelines
  * (`data_ingest.py`, `datalake_to_mart.py`, `datalake_compensation.py`)
  * as one Spark application with three stages:
  *
  *   1. ingest: pipe-delimited CSVs → typed lake tables (SRC1+S3/S4/S7 →
  *      SNK1; overwrite = WRITE_TRUNCATE, saveAsTable = CREATE_IF_NEEDED)
  *   2. mart: dedup + broadcast joins + scalar transforms → `schema_prod`
  *   3. compensation: decorrelated quota allocation, staged rewrite of
  *      the mart (replaces the reference's per-row UPDATE side effects)
  *
  * Usage: AirlinePipeline <dataDir> [asOfYear]
  *   dataDir must contain pasajero.csv, vuelo.csv, venta.csv; optional
  *   <table>.schema.json files override the built-in schemas (same
  *   BigQuery JSON field-list format the reference uses).
  */
object AirlinePipeline {

  val LakePrefix = "lake_"

  def ingest(spark: SparkSession, dataDir: String): Unit = {
    val tables = Seq(
      ("pasajero", AirlineSchemas.pasajero),
      ("vuelo", AirlineSchemas.vuelo),
      ("venta", AirlineSchemas.venta))
    tables.foreach { case (name, defaultSchema) =>
      val schemaFile = new java.io.File(s"$dataDir/$name.schema.json")
      val schema =
        if (schemaFile.exists())
          BqSchema.parse(new String(java.nio.file.Files.readAllBytes(schemaFile.toPath)))
        else defaultSchema
      PipeDelimitedSource.read(spark, s"$dataDir/$name.csv", schema)
        .write.mode("overwrite").saveAsTable(s"$LakePrefix$name")
    }
  }

  def buildMart(spark: SparkSession): DataFrame =
    MartBuilder.build(
      spark.table(s"${LakePrefix}venta"),
      spark.table(s"${LakePrefix}pasajero"),
      spark.table(s"${LakePrefix}vuelo"))

  def run(spark: SparkSession, dataDir: String, asOfYear: Int): Unit = {
    ingest(spark, dataDir)
    buildMart(spark).write.mode("overwrite").saveAsTable(s"${LakePrefix}schema_prod")
    val compensated = Compensation(spark.table(s"${LakePrefix}schema_prod"), asOfYear)
    // crash-safe retire-rename swap (never read and truncate the same
    // table in one job; at least one complete copy exists at every step
    // — a local DROP-then-RENAME would delete the only copy first)
    graft.sources.Bucketing.replaceTable(compensated, s"${LakePrefix}schema_prod")
  }

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse(
      sys.error("usage: AirlinePipeline <dataDir> [asOfYear]"))
    val asOfYear = args.lift(1).map(_.toInt)
      .getOrElse(java.time.LocalDate.now().getYear)
    val spark = graft.EngineSession.local()
    run(spark, dataDir, asOfYear)
    println(s"mart rows: " + spark.table(s"${LakePrefix}schema_prod").count())
    spark.stop()
  }
}

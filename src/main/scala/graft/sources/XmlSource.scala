package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** XML corpus source over Spark's built-in XML datasource (merged from
  * spark-xml in Spark 4) — the interchange format of the largest public
  * corpus dumps (Wikipedia/Wikimedia exports, PubMed, arXiv metadata,
  * patent corpora all ship XML). Same contract as the other graft
  * sources ([[JsonLinesSource]], [[CsvSource]]):
  *
  *   - **Explicit schema, never inference** — XML inference is a full
  *     extra pass (worse than JSON: it must reconcile attribute vs
  *     element shapes); callers pass the schema and the parser reads
  *     straight into it, with column pruning reaching the parser.
  *   - **Corrupt records are data, not failures** — PERMISSIVE mode
  *     quarantines each unparseable record into `corruptCol` (all
  *     schema fields null) instead of failing the job.
  *   - **Byte-exact text round-trip** — the writer escapes markup
  *     (`&`, `<`, `>`) per XML spec, and the reader keeps surrounding
  *     whitespace (`ignoreSurroundingSpaces=false` — the datasource's
  *     default TRIMS element text, silently corrupting documents whose
  *     leading/trailing whitespace is content; a corpus engine must
  *     not normalize text it didn't generate).
  *
  * Scale note: unlike JSONL/CSV, an XML file is splittable only at
  * `rowTag` boundaries the reader can rediscover — Spark's XML reader
  * does split by scanning for the row tag, so many-GB dump files still
  * parallelize; one record must still fit in executor memory (a
  * Wikipedia page, not the whole dump).
  */
object XmlSource {

  /** Write one `<rowTag>` element per row under a single `rootTag`
    * document per part file. OVERWRITE replaces an existing export —
    * the same replace-the-dump semantics as the other writers.
    */
  def write(
      df: DataFrame,
      path: String,
      rowTag: String = "row",
      rootTag: String = "rows",
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("rowTag", rowTag)
      .option("rootTag", rootTag)
      .format("xml").save(path)

  /** Read XML with an explicit schema; unparseable records survive as
    * quarantine rows (all fields null, raw snippet in `corruptCol`).
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      rowTag: String = "row",
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column — pass a different corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .option("rowTag", rowTag)
      .option("ignoreSurroundingSpaces", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .format("xml").load(path)
  }

  /** Strict variant: any unparseable record fails the scan. */
  def readStrict(
      spark: SparkSession,
      path: String,
      schema: StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.schema(schema)
      .option("rowTag", rowTag)
      .option("ignoreSurroundingSpaces", "false")
      .option("mode", "FAILFAST")
      .format("xml").load(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** RFC 4180 quoted-CSV source/sink — the interchange format the
  * reference's warehouse world actually exports (SRC1 is its
  * pipe-delimited cousin; this is the general form with quoting, so
  * separators and quote characters can appear IN the data).
  *
  * Dialect: fields containing the separator, the quote, or a newline are
  * wrapped in double quotes, and embedded quotes DOUBLE (`""`), never
  * backslash-escape. That choice is deliberate: Spark's writer default
  * escapes with `\`, which mainstream CSV readers (RFC 4180, DuckDB,
  * Excel, BigQuery) do not speak — setting `escape` to the quote char
  * itself produces the doubled form everyone parses. The reader pins the
  * same dialect.
  *
  * Scale rules, same as [[JsonLinesSource]]:
  *   - **Explicit schema, never inference** (inference is a full extra
  *     pass over 100 TB before the real scan).
  *   - **Corrupt lines are data, not failures**: PERMISSIVE quarantine
  *     into `corruptCol`, one bad line costs one audit row.
  *   - **No embedded newlines by default.** Parsing a quoted newline
  *     requires `multiLine=true`, which makes files NON-SPLITTABLE (one
  *     task per file — a 1 GB file is one task regardless of cluster
  *     width). Writers that must carry newlines should keep files small
  *     or use JSONL/parquet; `readMultiLine` exists for foreign files
  *     that already embed them.
  */
object CsvSource {

  private val dialect = Map(
    "header" -> "true",
    "quote" -> "\"",
    // escape == quote → RFC 4180 doubled quotes on write AND read
    "escape" -> "\"",
    // Spark's WRITER trims edge whitespace by default (the reader does
    // not) — a silent data change; a value is a value
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false")

  /** Write quoted CSV with a header line. `mode` defaults to OVERWRITE
    * (replace-the-export semantics — see JsonLinesSource.write).
    */
  def write(
      df: DataFrame,
      path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit =
    df.write.mode(mode).options(dialect).csv(path)

  /** Read with an explicit schema; unparseable lines survive as
    * quarantine rows (schema fields null, raw line in `corruptCol`).
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already has a '$corruptCol' column — pass a different corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .options(dialect)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
  }

  /** Strict variant: any unparseable line fails the scan. */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).options(dialect).option("mode", "FAILFAST").csv(path)

  /** Foreign files with quoted embedded newlines: correct but
    * NON-SPLITTABLE (see scaladoc) — never the default.
    */
  def readMultiLine(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).options(dialect)
      .option("multiLine", "true").option("mode", "FAILFAST").csv(path)
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed ingest of schema-declared, pipe-delimited, headerless CSV.
  *
  * Re-expresses the reference's ingest pipeline
  * (`/root/reference/src/data_ingest.py:35-76`) Spark-first: the format
  * contract is pipe-delimited, NO header row, CRLF line endings, no
  * trailing newline (SURVEY §1.5). Instead of a per-line Python parse fn,
  * we use Spark's native CSV reader (handles CRLF, codegen'd, splittable
  * for large files) to land every column as a string, then apply
  * schema-driven coercion as Catalyst expressions in one projection.
  *
  * Coercion rules (SURVEY §1.3, §1.5):
  *   - DATE: `1947/10/12` → DATE (reference reformats '/'→'-',
  *     data_ingest.py:64-67). Accepts both '/' and '-' separators.
  *   - TIMESTAMP: compact `20201019 00:00:00` → TIMESTAMP
  *     (data_ingest.py:68-71). Accepts ISO form too.
  *   - INTEGER (dirty-data policy, explicit where the reference was
  *     implicit): strip every character except digits and a leading '-'
  *     (so `+56943657435` → 56943657435), then cast; null when nothing
  *     numeric remains. The reference deferred this to BigQuery; we make
  *     the permissive policy explicit and tested.
  *   - FLOAT: plain cast, null on malformed.
  *   - Empty string → null for all non-STRING types.
  */
object PipeDelimitedSource {

  /** Read `path` (file, glob or directory) as pipe-delimited headerless
    * CSV and coerce to `schema`. Scales: the native reader splits large
    * files by range and the coercion projection is whole-stage-codegen'd.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val rawSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val raw = spark.read
      .option("sep", "|")
      .option("header", "false")
      .option("quote", "\"")
      .option("mode", "PERMISSIVE")
      .schema(rawSchema)
      .csv(path)
    raw.select(schema.fields.map(f => coerce(col(f.name), f.dataType).as(f.name)).toSeq: _*)
  }

  /** Schema-driven coercion of a string column to its declared type. */
  def coerce(c: Column, dt: DataType): Column = {
    val nonEmpty = when(length(trim(c)) > 0, trim(c))
    dt match {
      case StringType => c
      case LongType | IntegerType | ShortType =>
        // Dirty-integer policy: strip everything but digits; a leading
        // '-' (after trim) keeps the sign. `+56 9 4365-7435` -> 56943657435,
        // `-1 234` -> -1234, no digits at all -> null.
        // try_cast, not cast: under Spark 4's default ANSI mode a plain
        // cast THROWS on overflow (a 20+-digit dirty phone field would
        // kill the ingest job on one cell) — the documented policy is
        // null-on-malformed
        val digits = regexp_replace(nonEmpty, "[^0-9]", "")
        val signed = concat(when(nonEmpty.startsWith("-"), lit("-")).otherwise(lit("")), digits)
        when(length(digits) > 0, signed.try_cast(dt)).otherwise(lit(null).cast(dt))
      case DoubleType | FloatType =>
        nonEmpty.try_cast(dt)
      case DateType =>
        // Reference semantics: slash-formatted dates are reformatted to
        // dashes before load (S3). try_* variants keep the permissive
        // null-on-malformed contract under Spark 4's default ANSI mode.
        try_to_date(regexp_replace(nonEmpty, "/", "-"), "yyyy-M-d")
      case TimestampType =>
        // Compact `yyyyMMdd HH:mm:ss` (S4) or already-ISO.
        when(nonEmpty.rlike("^[0-9]{8} "), try_to_timestamp(nonEmpty, lit("yyyyMMdd HH:mm:ss")))
          .otherwise(try_to_timestamp(nonEmpty))
      case other => nonEmpty.try_cast(other)
    }
  }
}

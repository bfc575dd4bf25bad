package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus source — the de-facto interchange format for LLM
  * training corpora (one JSON object per line; Dolma, RedPajama, CC
  * dumps all ship this way). Two rules make it safe at 100 TB:
  *
  *   - **Explicit schema, never inference.** Schema inference is a full
  *     extra pass over the data BEFORE the real scan — at corpus scale
  *     that doubles the read. Callers pass the schema (from the
  *     catalog, a sibling parquet table, or a hand-written struct) and
  *     the scan parses straight into it; column pruning then reaches
  *     the parser (unprojected fields are never materialized), and with
  *     `spark.sql.json.filterPushdown.enabled` (default on) row filters
  *     evaluate during parsing.
  *   - **Corrupt lines are data, not failures.** Web-scale JSONL always
  *     carries some garbage (truncated lines, encoding damage, stray
  *     HTML). PERMISSIVE mode lands each unparseable line in
  *     `corruptCol` with every schema field null, so one bad line in a
  *     billion costs one quarantine row instead of a failed job — and a
  *     `WHERE corruptCol IS NOT NULL` slice audits exactly what was
  *     rejected.
  */
object JsonLinesSource {

  /** Write one JSON object per line. Output splits across part files by
    * partition — the natural parallel layout; JSONL has no footer or
    * row-group structure to preserve.
    *
    * `mode` defaults to OVERWRITE: an existing directory at `path` is
    * REPLACED, including data this writer didn't create — the
    * replace-the-export semantics corpus dumps want. Pass
    * `SaveMode.ErrorIfExists` (or `Append`) to refuse or add instead.
    */
  def write(
      df: DataFrame,
      path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Gzip-compressed JSONL — the shape Common Crawl WET/WAT dumps and
    * most published corpora actually ship (plain JSONL is the working
    * format; the interchange copy is gzipped). Reading needs NO
    * variant: the Hadoop codec engages from the `.json.gz` extension
    * transparently, for [[read]] and [[readStrict]] alike.
    *
    * The contract that matters at 100 TB: gzip is NOT splittable — one
    * task per file, parallelism = file count (the WARC regime, unlike
    * plain JSONL's block splits). Shard the WRITE side accordingly:
    * this writer emits one `.json.gz` per partition, so the writing
    * job's partitioning decides the reading job's parallelism. Aim for
    * file counts ≥ the reading cluster's cores and file sizes in the
    * 100 MB–1 GB band, not one giant archive.
    */
  def writeGzip(
      df: DataFrame,
      path: String,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "gzip").json(path)

  /** Read JSONL with an explicit schema. Unparseable lines survive as
    * quarantine rows: every schema field null, the raw line in
    * `corruptCol` (appended to the schema). Spark requires selecting the
    * corrupt column ALONGSIDE data columns (a corrupt-column-only
    * projection is rejected by the parser) — filter, don't project-only.
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
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Strict variant: any unparseable line fails the scan (FAILFAST).
    * For pipelines where a corrupt line means upstream breakage, not
    * web noise.
    */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}

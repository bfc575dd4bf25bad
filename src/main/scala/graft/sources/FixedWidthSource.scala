package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Fixed-width text source/sink — the mainframe/COBOL-export interchange
  * shape that still feeds real warehouses (positional fields, no
  * delimiters, one record per line). Two contracts make it safe:
  *
  *   - **Overflow REFUSES, never truncates.** A value wider than its
  *     field is data corruption waiting to happen (an 11-digit key
  *     silently becoming 10 digits survives every downstream check
  *     until reconciliation). The writer raises with the offending
  *     column and value instead — a loud failed job over a quiet wrong
  *     warehouse.
  *   - **Space padding ⇒ edge-space loss is explicit.** Values are
  *     right-padded on write and trimmed on read, so leading/trailing
  *     spaces in DATA do not survive — inherent to the format, stated
  *     here rather than discovered. (Values with embedded newlines are
  *     rejected by the same guard: the record frame is the line.)
  *
  * Everything is codegen'd built-ins (substring/rpad/concat/casts) over
  * the `text` datasource — one narrow projection per direction, no
  * UDFs, splittable files (line-framed, unlike WARC), so the scan
  * parallelizes by HDFS block at any corpus size.
  */
object FixedWidthSource {

  /** Write `df` as fixed-width lines; `fields` = (column, width) in
    * record order. Numeric/date/decimal columns serialize via their
    * canonical string form.
    */
  def write(df: DataFrame, path: String, fields: Seq[(String, Int)]): Unit = {
    require(fields.nonEmpty, "need at least one field")
    fields.foreach { case (n, w) => require(w >= 1, s"field $n width must be >= 1, got $w") }
    val cells: Seq[Column] = fields.map { case (name, w) =>
      val s = coalesce(col(name).cast("string"), lit(""))
      when(length(s) > w, raise_error(concat(
          lit(s"fixed-width overflow: column '$name' exceeds width $w: '"), s, lit("'"))))
        .when(s.contains("\n") || s.contains("\r"), raise_error(concat(
          lit(s"fixed-width value in '$name' contains a line break: '"), s, lit("'"))))
        .otherwise(rpad(s, w, " "))
    }
    df.select(concat(cells: _*).as("value")).write.mode("overwrite").text(path)
  }

  /** Read fixed-width lines back into typed columns; `fields` =
    * (column, width, sparkType). Fields are substring projections,
    * trimmed, then cast — empty cells become NULL, and a cast miss is
    * NULL too (the PERMISSIVE posture; pair with a `WHERE col IS NULL`
    * audit slice as with the JSONL source).
    */
  def read(
      spark: SparkSession,
      path: String,
      fields: Seq[(String, Int, DataType)]): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    val raw = spark.read.text(path)
    var start = 1
    val cols = fields.map { case (name, w, dt) =>
      val c = trim(substring(col("value"), start, w))
      start += w
      when(c === "", lit(null)).otherwise(c).cast(dt).as(name)
    }
    raw.select(cols: _*)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the second columnar interchange format next to
  * parquet (Hive-lineage warehouses ship ORC; a corpus engine that can
  * only read parquet cannot ingest them). Spark's native vectorized ORC
  * reader gives the same scan properties the parquet path has, and the
  * same two rules apply at 100 TB:
  *
  *   - **Explicit schema.** ORC footers carry the schema, so inference
  *     is cheap (footer-only), but passing the expected schema still
  *     matters: it turns silent drift (a producer renaming a column)
  *     into an immediate analysis error instead of a sea of nulls
  *     downstream, and guarantees the engine-side types (the decode
  *     contract) rather than whatever the last writer embedded.
  *   - **Pushdown must reach the scan.** Predicate pushdown into ORC
  *     uses the format's bloom/min-max stripe indexes
  *     (`spark.sql.orc.filterPushdown`, default on); column pruning
  *     reads only the projected streams. Both are verified in the spec
  *     by asserting `PushedFilters` on the scan node.
  */
object OrcSource {

  /** Write ORC with zstd compression (the modern default: parquet-level
    * ratios, decode speed well above zlib).
    *
    * `mode` defaults to OVERWRITE — replace-the-export semantics, like
    * [[JsonLinesSource.write]]; an existing directory at `path` is
    * replaced including data this writer didn't create. Pass
    * `SaveMode.ErrorIfExists` or `Append` to refuse or add instead.
    */
  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("compression", "zstd").orc(path)

  /** Read ORC with an explicit expected schema (see object doc). Spark
    * resolves ORC columns by name; a field present in `schema` but
    * missing in the files reads as null, so callers that want
    * drift-to-error semantics should compare `read(...).schema` against
    * the catalog — the spec pins the honored-projection behavior.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}

package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** SNK1 semantics (reference BigQuerySink WRITE_TRUNCATE +
  * CREATE_IF_NEEDED): `saveAsTable` with overwrite = auto-create +
  * truncate-before-write (SURVEY §2.1).
  */
class SinkSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("overwrite saveAsTable: auto-creates, truncates on rewrite") {
    spark.sql("DROP TABLE IF EXISTS lake_pasajero_test")
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("lake_pasajero_test")
    assert(spark.table("lake_pasajero_test").count() == 2)

    // truncate semantics: second write replaces, never appends
    Seq((3, "c")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("lake_pasajero_test")
    val rows = spark.table("lake_pasajero_test").collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 3)
    spark.sql("DROP TABLE lake_pasajero_test")
  }

  test("SNK2 replacement: set-wise rewrite instead of per-row UPDATE") {
    // the compensation pipeline's contract — full-column recompute +
    // overwrite — is exercised end-to-end in CompensationSpec; here we
    // check the write path keeps schema and row identity stable.
    spark.sql("DROP TABLE IF EXISTS mart_rewrite_test")
    val mart = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("k", "compensacion")
    mart.write.mode("overwrite").saveAsTable("mart_rewrite_test")
    val updated = spark.table("mart_rewrite_test")
      .withColumn("compensacion", org.apache.spark.sql.functions.lit("NO APLICA"))
    // write to a staging table then swap — the overwrite-self pattern
    updated.write.mode("overwrite").saveAsTable("mart_rewrite_test_stage")
    spark.sql("DROP TABLE mart_rewrite_test")
    spark.sql("ALTER TABLE mart_rewrite_test_stage RENAME TO mart_rewrite_test")
    val out = spark.table("mart_rewrite_test")
    assert(out.count() == 2)
    assert(out.where(out("compensacion") === "NO APLICA").count() == 2)
    spark.sql("DROP TABLE mart_rewrite_test")
  }
}

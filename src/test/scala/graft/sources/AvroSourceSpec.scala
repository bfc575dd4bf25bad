package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroSourceSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("graft_avro_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("roundtrip: all six column types including NULL cells are bit-identical") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("flag", BooleanType),
      StructField("s", StringType),
      StructField("b", BinaryType)))
    val rows = Seq(
      Row(1L, 7, 1.5, true, "héllo wörld", Array[Byte](0, 1, -1, 127)),
      Row(2L, null, null, false, null, null),
      Row(3L, -1, -0.0, null, "", Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir()
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir, schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getInt(1) == 7 &&
      back(0).getDouble(2) == 1.5 && back(0).getBoolean(3) &&
      back(0).getString(4) == "héllo wörld" &&
      back(0).getAs[Array[Byte]](5).toSeq == Seq[Byte](0, 1, -1, 127))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(4) &&
      back(1).isNullAt(5))
    // -0.0 must survive as -0.0 (Avro doubles are raw IEEE bits)
    assert(java.lang.Double.doubleToRawLongBits(back(2).getDouble(2)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
    assert(back(2).getString(4) == "" &&
      back(2).getAs[Array[Byte]](5).isEmpty)
  }

  test("one container file per non-empty partition; empty partitions write nothing") {
    val df = spark.range(0, 10, 1, 8).toDF("id")
      .where(col("id") < 3) // most partitions end up empty
    val dir = tmpDir()
    AvroSource.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 3, files.mkString(","))
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.endsWith(".inprogress")))
    val back = AvroSource.read(spark, dir,
      StructType(Seq(StructField("id", LongType, nullable = false))))
    assert(back.as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("unsupported column types are refused loudly, never coerced") {
    val df = Seq((1L, BigDecimal(1.5))).toDF("id", "d")
    val e = intercept[IllegalArgumentException] {
      AvroSource.write(df, tmpDir())
    }
    assert(e.getMessage.contains("unsupported Avro column type"))
  }

  test("reader-schema evolution: a field the file lacks surfaces as NULL") {
    val dir = tmpDir()
    AvroSource.write(Seq((1L, "a")).toDF("id", "s"), dir)
    val widened = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("added_later", StringType)))
    val back = AvroSource.read(spark, dir, widened).head()
    assert(back.getLong(0) == 1L && back.getString(1) == "a" && back.isNullAt(2))
  }
}

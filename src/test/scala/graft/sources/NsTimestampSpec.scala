package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nanosecond-precision timestamps must convert to microseconds by
  * TRUNCATION (matching DuckDB's ns→us cast). Regression for the
  * double-division bug: `col / 1000` rounds on the double grid (spacing
  * 0.25 µs at 2024-epoch magnitudes), flipping off-boundary ns values up
  * by a microsecond; `ts div 1000` is exact integer division.
  */
class NsTimestampSpec extends AnyFunSuite with SparkSpec {

  test("ns->us conversion truncates for every sub-microsecond remainder") {
    import spark.implicits._
    val baseNs = 1704067200L * 1000000000L + 123456000L // 2024-01-01 + offset
    val nsValues = Seq(0L, 1L, 499L, 500L, 501L, 876L, 999L).map(baseNs + _)

    val out = nsValues.toDF("ts")
      .withColumn("us_div", expr("ts div 1000"))
      .withColumn("us_double", (col("ts") / lit(1000L)).cast("long"))
      .collect()

    out.foreach { r =>
      val ns = r.getLong(0)
      assert(r.getLong(1) == ns / 1000, s"div path must floor (ns=$ns)")
    }
    // the double path really does round up for high remainders on this
    // magnitude — documents why `div` is required
    assert(out.exists(r => r.getLong(2) != r.getLong(0) / 1000))
  }
}

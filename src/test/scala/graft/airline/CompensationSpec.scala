package graft.airline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compensation (reference pipeline 3, decorrelated; SURVEY §2.8).
  * Fixtures pin the as-of year to 2026 for S5 determinism.
  */
class CompensationSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** Minimal 21-col mart with `n` rows on one flight; birth years cycle
    * through the given list (null birth year → null birthdate row).
    */
  private def mart(flight: String, birthYears: Seq[Option[Int]],
                   pre: Map[Int, String] = Map.empty): DataFrame = {
    val rows = birthYears.zipWithIndex.map { case (by, i) =>
      (s"dni-$i", flight, by.map(y => s"$y-06-15").orNull, pre.get(i).orNull)
    }
    val base = rows.toDF("dni", "cod_vuelo", "birth", "compensacion")
      .withColumn("fecha_de_nacimiento", to_date(col("birth"))).drop("birth")
    AirlineSchemas.martColumns.foldLeft(base) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast("string"))
    }.withColumn("monto", lit(100.0))
      .withColumn("fecha_reserva", to_timestamp(lit("2020-10-19 00:00:00")))
      .withColumn("fecha_compra", to_timestamp(lit("2020-10-20 00:00:00")))
      .select(AirlineSchemas.martColumns.map(col): _*)
  }

  private def grants(df: DataFrame): Map[String, String] =
    df.select("dni", "compensacion").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("A1 quota boundary: 19 rows -> 0 quota, nothing assigned") {
    val m = mart("F1", Seq.fill(19)(Some(1950)))
    val out = Compensation(m, asOfYear = 2026)
    assert(out.where($"compensacion".isNotNull).count() == 0)
  }

  test("A1 quota boundary: 20 rows -> 3 preferential, rest untouched") {
    val m = mart("F1", Seq.fill(20)(Some(1950))) // age 76 > 60 → all eligible
    val out = Compensation(m, asOfYear = 2026)
    val g = grants(out)
    assert(g.values.count(_ == Compensation.Asiento) == 3)
    assert(g.values.count(_ == null) == 17)
    // deterministic: lowest dni ranks win (dni-0, dni-1, dni-10 sort lexically)
    val granted = g.filter(_._2 != null).keys.toSeq.sorted
    assert(granted == g.keys.toSeq.sorted.take(3))
  }

  test("S5/S6 age boundaries at as-of year: <14 asistencia, >60 asiento, else NO APLICA") {
    // ages: 13 (2013→2026), 14, 60, 61 and 40 rows total for quota 6
    val years = Seq.fill(36)(Some(1980)) ++ Seq(Some(2013), Some(2012), Some(1966), Some(1965))
    val m = mart("F2", years)
    val out = Compensation(m, asOfYear = 2026)
    val g = grants(out)
    // quota = floor(40/20)*3 = 6 ≥ 2 eligible → both granted
    assert(g("dni-36") == Compensation.Asistencia) // age 13
    assert(g("dni-39") == Compensation.Asiento)    // age 61
    // 14 and 60 are mid-range → NO APLICA (quota remained)
    assert(g("dni-37") == Compensation.NoAplica)   // age 14
    assert(g("dni-38") == Compensation.NoAplica)   // age 60
    // mid-age bulk rows get NO APLICA too
    assert(g("dni-0") == Compensation.NoAplica)
  }

  test("rows on a NULL flight (dim-miss) keep their value, never NO APLICA") {
    // 20 rows on F0 (quota 3) + one mid-age row with cod_vuelo NULL
    val m = mart("F0", Seq.fill(20)(Some(1950)))
      .unionByName(mart(null, Seq(Some(1980))))
    val out = Compensation(m, asOfYear = 2026)
    val orphan = out.where($"cod_vuelo".isNull).head()
    assert(orphan.getAs[String]("compensacion") == null)
  }

  test("null birthdate rows are never touched") {
    val m = mart("F3", Seq.fill(20)(Some(1950)) :+ None)
    val out = Compensation(m, asOfYear = 2026)
    assert(grants(out)("dni-20") == null)
  }

  test("A2: pre-granted rows consume quota and are not re-granted") {
    // 20 rows → quota 3; two already granted → only 1 new grant
    val m = mart("F4", Seq.fill(20)(Some(1950)),
      pre = Map(5 -> Compensation.Asistencia, 7 -> Compensation.Asiento))
    val out = Compensation(m, asOfYear = 2026)
    val g = grants(out)
    assert(g("dni-5") == Compensation.Asistencia) // kept
    assert(g("dni-7") == Compensation.Asiento)    // kept
    val newGrants = g.filter { case (k, v) => v == Compensation.Asiento && k != "dni-7" }
    assert(newGrants.size == 1)
  }

  test("invariant: per-flight grants never exceed floor(n/20)*3") {
    val rnd = new scala.util.Random(7)
    val years = Seq.fill(93)(Some(1940 + rnd.nextInt(80)))
    val m = mart("F5", years) // quota = floor(93/20)*3 = 12
    val out = Compensation(m, asOfYear = 2026)
    val granted = out.where($"compensacion".isin(Compensation.Asistencia, Compensation.Asiento)).count()
    assert(granted <= 12)
  }
}

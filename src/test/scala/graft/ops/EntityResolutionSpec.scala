package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("hand cases: each edit position routes through a blocking pass") {
    val recs = Seq(
      (1L, "goldenrod lace"),
      (2L, "Xoldenrod lace"),  // substitution at pos 0: prefix breaks, suffix catches
      (3L, "goldenrod lacy"),  // substitution at tail: prefix catches
      (4L, "goldenrod lac"),   // deletion at tail: prefix catches, length filter passes
      (5L, "oldenrod lace"),   // deletion at pos 0: suffix catches
      (6L, "silver bolt")      // unrelated
    ).toDF("rec_id", "name")
    val out = EntityResolution.resolveEntities(recs, "rec_id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out.keySet.map(_ match { case (a, b) => (a, b) })
      .intersect(Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).size == 4, out)
    assert(!out.keySet.exists(p => p._1 == 6L || p._2 == 6L))
    assert(out((1L, 2L)) == 1 && out((1L, 4L)) == 1)
  }

  test("dist 0 (exact duplicate names) and the maxDist bound") {
    val recs = Seq((1L, "same name"), (2L, "same name"), (3L, "sXme nYme"))
      .toDF("rec_id", "name")
    val out = EntityResolution.resolveEntities(recs, "rec_id", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out == Map((1L, 2L) -> 0)) // dist-2 record excluded
  }

  test("completeness at maxDist=1: blocking finds every brute-force pair") {
    // registry of word-pair names + ALL single edits of a sample of them:
    // blocked result must equal the brute-force levenshtein<=1 cross join
    val words = Vector("amber", "birch", "cedar", "delta", "ember", "fjord")
    val names = (for { a <- words; b <- words } yield s"$a $b").distinct
    val edited = names.zipWithIndex.collect { case (n, i) if i % 3 == 0 =>
      val p = i % n.length
      val del = n.substring(0, p) + n.substring(math.min(p + 1, n.length))
      val sub = n.updated(p, if (n(p) == 'z') 'y' else 'z')
      Seq(del, sub)
    }.flatten
    val recs = (names ++ edited).zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("rec_id", "name")
    val blockedPairs = EntityResolution.resolveEntities(recs, "rec_id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = recs.as("x").join(recs.as("y"), col("x.rec_id") < col("y.rec_id"))
      .select(col("x.rec_id"), col("y.rec_id"),
        levenshtein(col("x.name"), col("y.name")).as("d"))
      .where(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(blockedPairs == brute,
      s"missed: ${brute -- blockedPairs}; extra: ${blockedPairs -- brute}")
    assert(brute.nonEmpty)
  }
}

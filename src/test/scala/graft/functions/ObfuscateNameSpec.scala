package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** S2 obfuscation semantics (reference `datalake_to_mart.py:133-144`):
  * first token verbatim; in the rest, keep chars equal to the rest's first
  * char (anywhere, case-sensitive) and spaces; star everything else.
  */
class ObfuscateNameSpec extends AnyFunSuite with SparkSpec {

  private def run(names: Seq[String]): Seq[String] = {
    import spark.implicits._
    names.toDF("n")
      .select(ObfuscateName.obfuscate_name(col("n")).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("worked example from the reference") {
    assert(run(Seq("Lane Weber Obama")) == Seq("Lane W**** *****"))
  }

  test("single-token name gets trailing space") {
    assert(run(Seq("Solo")) == Seq("Solo "))
  }

  test("empty string yields single space") {
    assert(run(Seq("")) == Seq(" "))
  }

  test("null stays null") {
    assert(run(Seq(null)) == Seq(null))
  }

  test("first char of last name kept anywhere it repeats, case-sensitive") {
    // last name "aba Ab": keep 'a' (both) and space; 'A' != 'a' → starred
    assert(run(Seq("X aba Ab")) == Seq("X a*a **"))
  }

  test("trailing-space-only name kept as-is") {
    assert(run(Seq("Lane ")) == Seq("Lane "))
  }

  test("double space: last name starts with the second space") {
    // split at FIRST space; last = " B"; keep char = ' ' → space kept, B starred
    assert(run(Seq("A  B")) == Seq("A  *"))
  }

  test("property: length preserved (+1 only for space-free input) and spaces positional") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(200) {
      val len = rnd.nextInt(15)
      (0 until len).map(_ => if (rnd.nextInt(4) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val outs = run(samples)
    samples.zip(outs).foreach { case (in, out) =>
      val expected = if (in.contains(' ')) in.length else in.length + 1
      assert(out.length == expected, s"input='$in' output='$out'")
      in.zip(out).foreach { case (i, o) => if (i == ' ') assert(o == ' ', s"input='$in' output='$out'") }
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-position character L-gram digests in ONE pass over the text —
  * the gram kernel of [[graft.ops.Dedup.repeatedSpans]].
  *
  * Value-equal to `unhex(md5(text.substr(pos + 1, L)))` at every
  * position (spec-pinned, multibyte included), but linear where the
  * expression chain is quadratic: `Substring` on a string walks bytes
  * from the START to find the char offset (UTF-8 has no random access),
  * so per-gram extraction costs O(pos) and a document pays
  * O(len²/2) — ~39 executor-CPU-s for 2.9 M grams at sf0.1, and worse
  * the longer the documents. This kernel builds the char→byte offset
  * table once and digests `bytes[off(p), off(p+L))` per position:
  * O(len·L) total, all of it inside MD5 itself.
  *
  * Char = Unicode code point (UTF-8 sequence start bytes), matching
  * both Spark's `Substring` and DuckDB's `substr` — the oracle's
  * grouping by raw gram text stays bit-equivalent.
  */
object CharGrams {

  def gramKernel(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val nBytes = bytes.length
    // char-boundary table: offs(i) = byte offset where char i starts;
    // continuation bytes are 10xxxxxx and never start a char
    var nChars = 0
    var i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    val out = nChars - n + 1
    if (out <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < nBytes) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = nBytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val arr = new Array[AnyRef](out)
    var p = 0
    while (p < out) {
      md.reset()
      md.update(bytes, offs(p), offs(p + n) - offs(p))
      arr(p) = md.digest()
      p += 1
    }
    new GenericArrayData(arr)
  }

  /** Column API: char_gram_digests(text, n) → array<binary> (16-byte
    * md5 per position; posexplode yields (pos, digest) directly).
    */
  def char_gram_digests(text: Column, n: Int): Column =
    shims.column(CharGramDigestsExpr(shims.expression(text), n))
}

case class CharGramDigestsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"gram length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_digests requires STRING, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "char_gram_digests"

  override def nullSafeEval(input: Any): Any =
    CharGrams.gramKernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGrams.gramKernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharGramDigestsExpr =
    copy(child = newChild)
}

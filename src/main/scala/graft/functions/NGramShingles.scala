package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased text, as one native pass.
  *
  * Exactly mirrors the SQL-expressible formulation (and the DuckDB
  * oracle): lowercase → trim → split on `\s+` → n-grams joined with a
  * single space → distinct; texts shorter than n words yield one
  * whole-text shingle. `\s` means the Java regex class
  * `[ \t\n\x0B\f\r]`, reproduced literally.
  *
  * The higher-order `transform(sequence(...))` version
  * ([[graft.ops.Dedup.shingles]]) is interpreted and gets pushed below
  * repartition exchanges, serializing dedup pipelines onto the source's
  * partition count; this kernel runs inside whole-stage codegen.
  */
object NGramShingles {

  /** Java regex whitespace class — shared by every whitespace-tokenizing
    * kernel so their token boundaries can never drift apart.
    */
  private[functions] def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def shingleKernel(text: UTF8String, n: Int): ArrayData = {
    // Locale.ROOT: the default locale would make 'I' lowercase to
    // dotless-i on Turkish JVMs, silently diverging from Spark's
    // locale-independent lower() (used by the HOF twin and the oracles)
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    // manual trim+split on whitespace runs (regex-\s semantics)
    val tokens = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len && isSpace(s.charAt(i))) i += 1
    var start = i
    while (i <= len) {
      if (i == len || isSpace(s.charAt(i))) {
        if (i > start) tokens += s.substring(start, i)
        while (i < len && isSpace(s.charAt(i))) i += 1
        start = i
        if (i == len) i += 1
      } else i += 1
    }
    if (tokens.isEmpty) tokens += "" // split("") == [""] in SQL semantics

    val out = new java.util.LinkedHashSet[String]()
    if (tokens.length >= n) {
      var j = 0
      val sb = new java.lang.StringBuilder(64)
      while (j <= tokens.length - n) {
        sb.setLength(0)
        var m = 0
        while (m < n) {
          if (m > 0) sb.append(' ')
          sb.append(tokens(j + m))
          m += 1
        }
        out.add(sb.toString)
        j += 1
      }
    } else {
      out.add(tokens.mkString(" "))
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** Column API: ngram_shingles(text, n) → array<string>. */
  def ngram_shingles(text: Column, n: Int): Column =
    shims.column(NGramShinglesExpr(shims.expression(text), n))
}

case class NGramShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles requires STRING, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any =
    NGramShingles.shingleKernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramShingles.shingleKernel($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramShinglesExpr =
    copy(child = newChild)
}

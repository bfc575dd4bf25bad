package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive document fingerprint: FNV-1a/64 over the
  * whitespace-normalized token stream — the byte sequence of the
  * document's `\S+` tokens joined by single spaces. Two documents share
  * a fingerprint iff their token SEQUENCES are identical (whitespace
  * runs collapse, leading/trailing whitespace drops), and the space
  * separator keeps token boundaries in the hash (["ab","c"] ≠ ["a","bc"]).
  *
  * FNV-1a (Fowler–Noll–Vo, public domain) is chosen over Spark's
  * xxhash64 because it is self-contained byte arithmetic a warehouse
  * oracle recomputes bit-for-bit — the same property [[SimHash.fnv1a64]]
  * exploits (DuckDB: UBIGINT xor + HUGEINT modular multiply). One
  * codegen'd pass over the raw UTF-8 bytes, no token-array
  * materialization, no interpreted lambda. The wrapping 64-bit multiply
  * lives inside the JVM kernel, outside ANSI-mode expression arithmetic.
  */
object Fingerprint {

  /** Kernel: FNV-1a/64 over the bytes of `tokens(text).mkString(" ")`,
    * computed in one pass over the raw UTF-8 bytes (no join, no copy).
    * Whitespace bytes are the Java regex `\s` class — all ASCII, so
    * byte-level scanning can never split a multi-byte UTF-8 sequence
    * (continuation bytes are ≥ 0x80). Empty/all-space text hashes to
    * the FNV offset basis.
    *
    * Regex-dialect caveat (applies to EVERY `\S+`-tokenized oracle in
    * this engine, not just the fingerprint): Java's `\s` includes
    * vertical tab (0x0B); RE2 — DuckDB's engine — does not. A document
    * containing 0x0B tokenizes differently in the two engines. The
    * kernel sides with Java/Spark (`TextAnalysis.tokens` is Spark
    * `regexp_extract_all`, Java dialect); corpora with vertical tabs
    * should normalize them out before fingerprint/oracle comparison.
    */
  def fingerprintKernel(text: UTF8String): Long = {
    val bytes = text.getBytes
    val len = bytes.length
    var h = 0xcbf29ce484222325L // FNV-1a/64 offset basis
    var first = true
    var i = 0
    while (i < len) {
      while (i < len && isSpaceByte(bytes(i))) i += 1
      val start = i
      while (i < len && !isSpaceByte(bytes(i))) i += 1
      if (i > start) {
        if (!first) { h ^= 0x20L; h *= 0x100000001b3L } // the ' ' separator
        first = false
        var j = start
        while (j < i) {
          h ^= (bytes(j) & 0xffL)
          h *= 0x100000001b3L
          j += 1
        }
      }
    }
    h
  }

  @inline private def isSpaceByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def fingerprint(text: Column): Column =
    shims.column(FingerprintExpr(shims.expression(text)))
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires STRING, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"

  override def nullSafeEval(input: Any): Any =
    Fingerprint.fingerprintKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Fingerprint.fingerprintKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

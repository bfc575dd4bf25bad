package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive document fingerprint: xxhash64 chained over
  * whitespace tokens, value-identical to the higher-order formulation
  * `aggregate(tokens(text), 0L, (acc, t) => xxhash64(acc, t))` (each
  * Spark `xxhash64(acc, t)` call folds seed 42 → acc → t), but executed
  * as ONE codegen'd pass with no token-array materialization and no
  * interpreted lambda — the hot-path requirement for a per-row corpus
  * transform ([[VectorKernels]] has the same rationale).
  */
object Fingerprint {

  /** Kernel: split on whitespace runs (regex `\S+` semantics), chain
    * acc → xxhash64(acc, token) starting from 0.
    */
  def fingerprintKernel(text: UTF8String): Long = {
    val s = text.toString
    var acc = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && NGramShingles.isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !NGramShingles.isSpace(s.charAt(i))) i += 1
      if (i > start) {
        val h1 = XxHash64Function.hash(acc, LongType, 42L)
        acc = XxHash64Function.hash(
          UTF8String.fromString(s.substring(start, i)), StringType, h1)
      }
    }
    acc
  }

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

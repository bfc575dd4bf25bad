package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Fused native vector kernels for `array<float>` / `array<double>`.
  *
  * The higher-order-function formulations in [[VectorFunctions]]
  * (`zip_with` + `aggregate`) are semantically identical but run their
  * lambdas INTERPRETED — ~50µs per 64-dim cosine. These expressions
  * generate a single primitive loop inside whole-stage codegen
  * (~100ns per cosine), the difference between an all-pairs similarity
  * join finishing in seconds vs hours at scale.
  *
  * FP semantics are kept bit-identical to the HOF versions (and to the
  * DuckDB oracle): each accumulator is a sequential left fold over
  * element index, products/casts in double.
  *
  * Null contract (matches zip_with/aggregate): null array, mismatched
  * lengths, or any null element → null result. Cosine additionally
  * yields null when either norm is zero (never NaN).
  */
object VectorKernels {

  /** Fused dot product; returns null (boxed) per the null contract. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Fused cosine similarity: one pass accumulating ab, aa, bb. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val na = math.sqrt(aa); val nb = math.sqrt(bb)
    if (na == 0.0 || nb == 0.0) null else ab / (na * nb)
  }

  /** Fused squared L2 distance. */
  def l2Sq(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  def dot_native(a: Column, b: Column): Column =
    shims.column(VectorKernelExpr(shims.expression(a), shims.expression(b), "dot"))
  def cosine_native(a: Column, b: Column): Column =
    shims.column(VectorKernelExpr(shims.expression(a), shims.expression(b), "cosine"))
  def l2sq_native(a: Column, b: Column): Column =
    shims.column(VectorKernelExpr(shims.expression(a), shims.expression(b), "l2Sq"))
}

/** Binary vector kernel expression; `kernel` ∈ dot|cosine|l2Sq. */
case class VectorKernelExpr(left: Expression, right: Expression, kernel: String)
    extends BinaryExpression {

  private def elemFloat(e: Expression): Option[Boolean] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat(left).isDefined && elemFloat(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = s"vec_$kernel"

  private def aF = elemFloat(left).get
  private def bF = elemFloat(right).get

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = kernel match {
      case "dot"    => VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
      case "cosine" => VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
      case "l2Sq"   => VectorKernels.l2Sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
    }
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed = graft.functions.VectorKernels.$kernel(
            ${leftGen.value}, ${rightGen.value}, $aF, $bF);
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorKernelExpr =
    copy(left = newLeft, right = newRight)
}

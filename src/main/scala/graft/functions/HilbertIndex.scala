package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the locality-tight sibling of
  * [[InterleaveBits]]' Morton key. Both linearize a 2-D grid so min-max
  * file statistics bound BOTH dimensions, but the Z-curve takes one
  * long diagonal jump per quadrant boundary (the key's second half
  * restarts at the far corner), so a file that spans such a boundary
  * owns a WIDE rectangle — the straddle case ZOrderSpec documents. The
  * Hilbert curve's defining property is unit steps: consecutive
  * indices are always Manhattan-distance-1 neighbors (property-tested
  * in ZOrderSpec), so every contiguous index range — every file — is a
  * compact blob, never a diagonal-spanning one. Delta Lake made the
  * same Morton→Hilbert upgrade for `OPTIMIZE ... ZORDER`'s successor
  * (liquid clustering); the algorithm here is the public-domain
  * rotate-and-accumulate recipe (Hilbert 1891; C version on the
  * "Hilbert curve" Wikipedia page).
  *
  * Inputs are LONGs already normalized to [0, 2³¹) — 31 bits per
  * dimension so the 62-bit index stays inside a signed long (the
  * Morton kernel packs 32+32 exactly; Hilbert's `d` covers the FULL
  * square even when only one coordinate uses its top bit, so 32-bit
  * inputs could not guarantee a non-negative key). Out-of-range values
  * are masked to their low 31 bits (documented, not an error: the key
  * orders layout, it carries no semantics).
  */
object HilbertIndex {

  final val Order = 31

  /** (x, y) → Hilbert index d ∈ [0, 4^Order): per-bit quadrant
    * accumulate + rotate, most significant bit first.
    */
  def hilbert(x0: Long, y0: Long): Long = {
    val mask = (1L << Order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the sub-square so the curve connects
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (index → point), least significant bit first — the spec's
    * tool for proving the unit-step property without materializing the
    * forward map over the whole square.
    */
  def inverse(d0: Long): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << Order)) {
      val rx = 1L & (t >> 1)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t >>= 2
      s <<= 1
    }
    (x, y)
  }

  /** Column API: 62-bit Hilbert index from two [0, 2³¹) longs. */
  def hilbert_index(a: Column, b: Column): Column =
    shims.column(HilbertIndexExpr(shims.expression(a), shims.expression(b)))
}

case class HilbertIndexExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (BIGINT, BIGINT), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.hilbert(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertIndex.hilbert($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

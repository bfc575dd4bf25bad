package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 32-bit values into one 64-bit
  * key — the multi-dimensional clustering primitive: sorting rows by
  * the interleaved key gives every PREFIX of the key a bounded range in
  * BOTH source dimensions, so file/row-group min-max stats prune scans
  * filtered on EITHER column (a single-column sort prunes only its own
  * column). This is the layout trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, reimplemented from the public bit-interleaving recipe
  * (Morton 1966; "spread the bits with magic masks" is folklore, e.g.
  * Hacker's Delight §7-2).
  *
  * Inputs are LONGs already normalized to [0, 2³²) — [[graft.ops.ZOrder]]
  * does the min-max normalization; values outside the range are masked
  * to their low 32 bits (documented, not an error: the key orders
  * layout, it carries no semantics).
  */
object InterleaveBits {

  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def morton(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)

  /** Column API: 64-bit Morton key from two [0, 2³²) longs. */
  def interleave_bits(a: Column, b: Column): Column =
    shims.column(InterleaveBitsExpr(shims.expression(a), shims.expression(b)))
}

case class InterleaveBitsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires (BIGINT, BIGINT), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.InterleaveBits.morton($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBitsExpr =
    copy(left = newLeft, right = newRight)
}

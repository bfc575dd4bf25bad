package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** IVF cell-assignment kernels: given a vector and the full centroid set
  * (as ONE array<struct<id bigint, vec array<float|double>>> value,
  * produced by `collect_list(struct(...))` over the centroid table and
  * broadcast as a single-row cross join), compute the nearest cell or
  * the `nProbe` nearest cells in a single codegen pass.
  *
  * This is what makes IVF assignment a NARROW operation: the corpus
  * never shuffles — each row reads the broadcast centroid array and
  * emits its cell id. The join+min_by formulation this replaces shuffled
  * one full-vector row per corpus element through a groupBy.
  *
  * Ties on distance break toward the smaller centroid id, so results are
  * deterministic regardless of the order `collect_list` produced.
  */
object IvfCells {

  /** Nearest centroid id by squared L2; null when the vector is null or
    * no centroid has a comparable (same-length, non-null) vector.
    */
  def nearestCell(vec: ArrayData, cents: ArrayData, vF: Boolean, cF: Boolean): java.lang.Long = {
    val n = cents.numElements()
    var best = Double.MaxValue
    var bestId = Long.MinValue
    var found = false
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          val d = VectorKernels.l2Sq(vec, row.getArray(1), vF, cF)
          if (d != null) {
            val dv = d.doubleValue()
            if (!found || dv < best || (dv == best && id < bestId)) {
              best = dv; bestId = id; found = true
            }
          }
        }
      }
      i += 1
    }
    if (found) bestId else null
  }

  /** The `nProbe` nearest centroid ids, ordered by (distance, id). */
  def topCells(vec: ArrayData, cents: ArrayData, nProbe: Int, vF: Boolean, cF: Boolean): ArrayData = {
    val n = cents.numElements()
    val ds = new Array[Double](n)
    val ids = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val d = VectorKernels.l2Sq(vec, row.getArray(1), vF, cF)
          if (d != null) {
            ds(m) = d.doubleValue(); ids(m) = row.getLong(0); m += 1
          }
        }
      }
      i += 1
    }
    val take = math.min(nProbe, m)
    val out = new Array[Long](take)
    // selection sort of the top `take` — nCentroids is small by contract
    var s = 0
    while (s < take) {
      var bi = s
      var j = s + 1
      while (j < m) {
        if (ds(j) < ds(bi) || (ds(j) == ds(bi) && ids(j) < ids(bi))) bi = j
        j += 1
      }
      val td = ds(s); ds(s) = ds(bi); ds(bi) = td
      val ti = ids(s); ids(s) = ids(bi); ids(bi) = ti
      out(s) = ids(s)
      s += 1
    }
    new GenericArrayData(out)
  }

  def nearest_cell(vec: Column, cents: Column): Column =
    shims.column(NearestCellExpr(shims.expression(vec), shims.expression(cents)))

  def top_cells(vec: Column, cents: Column, nProbe: Int): Column =
    shims.column(TopCellsExpr(shims.expression(vec), shims.expression(cents), nProbe))
}

trait IvfCellLike extends BinaryExpression {
  protected def vecFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  protected def centFloat: Boolean = right.dataType match {
    case ArrayType(StructType(fs), _) => fs(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    case _ => false
  }

  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (v, ArrayType(st: StructType, _))
        if isVec(v) && st.length == 2 &&
          st(0).dataType == LongType && isVec(st(1).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, ARRAY<STRUCT<BIGINT, ARRAY<FLOAT|DOUBLE>>>), " +
        s"got ${l.sql}, ${r.sql}")
  }
}

/** nearest_cell(vec, cents) → BIGINT cell id. */
case class NearestCellExpr(left: Expression, right: Expression) extends IvfCellLike {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(v: Any, c: Any): Any = {
    val r = IvfCells.nearestCell(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], vecFloat, centFloat)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${l.isNull} && !${r.isNull}) {
          java.lang.Long $boxed = graft.functions.IvfCells.nearestCell(
            ${l.value}, ${r.value}, $vecFloat, $centFloat);
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCellExpr =
    copy(left = l, right = r)
}

/** top_cells(vec, cents, nProbe) → ARRAY<BIGINT> of probe cell ids. */
case class TopCellsExpr(left: Expression, right: Expression, nProbe: Int) extends IvfCellLike {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_cells"

  override def nullSafeEval(v: Any, c: Any): Any =
    IvfCells.topCells(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], nProbe, vecFloat, centFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.functions.IvfCells.topCells($v, $c, $nProbe, $vecFloat, $centFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopCellsExpr =
    copy(left = l, right = r, nProbe = nProbe)
}

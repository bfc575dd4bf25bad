package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * A PQ codebook splits a `dim`-dimensional vector into `m` contiguous
  * subvectors of `dim/m` elements and quantizes each against its own
  * `ksub`-entry sub-codebook. A corpus vector compresses to `m` byte-ish
  * codes (SMALLINT here) — at 100 TB this is the difference between
  * holding raw float vectors (dim×4 bytes each) and holding `m` bytes +
  * one stored norm per vector in the scan.
  *
  * Codebook wire format reuses the IVF centroid layout — ONE
  * `array<struct<id bigint, vec array<float|double>>>` value produced by
  * `collect_list(struct(...))` and broadcast as a single-row cross join —
  * with `id = sub*ksub + code`, `code ∈ [0, ksub)`. Sub-codebooks may be
  * sparse in code space (Lloyd iterations can empty a cell); every kernel
  * tolerates gaps because codes are only ever produced by [[pqEncode]]
  * against the same codebook.
  *
  * Asymmetric distance computation (ADC) splits per-pair work:
  *   - [[pqLut]] runs ONCE per query: lut[sub*ksub + code] =
  *     dot(q_sub, centroid_vec) — m·ksub·subDim = ksub·dim multiplies.
  *   - [[adcScore]] runs per (query, corpus row): Σ_sub lut[codes[sub]]
  *     — m ADDS, vs `dim` multiply-adds for an exact dot product. The
  *     scoring join's inner loop drops from O(dim) to O(m).
  *
  * Null contract (matches [[VectorKernels]]): null vector, null codebook,
  * vector length not divisible by m, a null element in scope, or a
  * sub-codebook with no comparable entry → null result.
  */
object PqKernels {

  /** Squared L2 between vec[off, off+len) and the whole of cv. */
  private def sliceL2(
      vec: ArrayData, off: Int, cv: ArrayData,
      vF: Boolean, cF: Boolean): java.lang.Double = {
    val len = cv.numElements()
    var s = 0.0
    var i = 0
    while (i < len) {
      if (vec.isNullAt(off + i) || cv.isNullAt(i)) return null
      val x = if (vF) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
      val y = if (cF) cv.getFloat(i).toDouble else cv.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** Dot product between vec[off, off+len) and the whole of cv. */
  private def sliceDot(
      vec: ArrayData, off: Int, cv: ArrayData,
      vF: Boolean, cF: Boolean): java.lang.Double = {
    val len = cv.numElements()
    var s = 0.0
    var i = 0
    while (i < len) {
      if (vec.isNullAt(off + i) || cv.isNullAt(i)) return null
      val x = if (vF) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
      val y = if (cF) cv.getFloat(i).toDouble else cv.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Quantize `vec` to its m PQ codes: codes[sub] = argmin_code
    * l2(vec_sub, centroid_{sub,code}), ties toward the smaller code (the
    * same determinism rule as [[IvfCells.nearestCell]]). Null when the
    * vector length is not divisible by m or any subspace has no
    * comparable centroid.
    */
  def pqEncode(
      vec: ArrayData, cents: ArrayData, m: Int, ksub: Int,
      vF: Boolean, cF: Boolean): ArrayData = {
    val dim = vec.numElements()
    if (m <= 0 || ksub <= 0 || dim == 0 || dim % m != 0) return null
    val subDim = dim / m
    val best = new Array[Double](m)
    val bestId = new Array[Long](m)
    val found = new Array[Boolean](m)
    val n = cents.numElements()
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          if (id >= 0L && id < m.toLong * ksub) {
            val sub = (id / ksub).toInt
            val cv = row.getArray(1)
            if (cv.numElements() == subDim) {
              val d = sliceL2(vec, sub * subDim, cv, vF, cF)
              if (d != null) {
                val dv = d.doubleValue()
                if (!found(sub) || dv < best(sub) ||
                  (dv == best(sub) && id < bestId(sub))) {
                  best(sub) = dv; bestId(sub) = id; found(sub) = true
                }
              }
            }
          }
        }
      }
      i += 1
    }
    val out = new Array[Short](m)
    var s = 0
    while (s < m) {
      if (!found(s)) return null
      out(s) = (bestId(s) % ksub).toShort
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Build a query's ADC lookup table: a dense array of length m·ksub
    * with lut[sub*ksub + code] = dot(vec_sub, centroid_{sub,code}).
    * Codes for absent codebook entries stay 0.0 — unreachable, since
    * [[pqEncode]] only emits codes that exist in the same codebook.
    */
  def pqLut(
      vec: ArrayData, cents: ArrayData, m: Int, ksub: Int,
      vF: Boolean, cF: Boolean): ArrayData = {
    val dim = vec.numElements()
    if (m <= 0 || ksub <= 0 || dim == 0 || dim % m != 0) return null
    val subDim = dim / m
    val lut = new Array[Double](m * ksub)
    val n = cents.numElements()
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          if (id >= 0L && id < m.toLong * ksub) {
            val cv = row.getArray(1)
            if (cv.numElements() == subDim) {
              val d = sliceDot(vec, (id / ksub).toInt * subDim, cv, vF, cF)
              if (d == null) return null
              lut(id.toInt) = d.doubleValue()
            }
          }
        }
      }
      i += 1
    }
    new GenericArrayData(lut)
  }

  /** ADC score: Σ_sub lut[sub*ksub + codes[sub]], the approximate dot
    * product of the query against the code-reconstructed corpus vector.
    * ksub is recovered as lut.length / codes.length — both sides must
    * come from the same codebook geometry.
    */
  def adcScore(lut: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0) return null
    val total = lut.numElements()
    if (total % m != 0) return null
    val ksub = total / m
    var s = 0.0
    var sub = 0
    while (sub < m) {
      if (codes.isNullAt(sub)) return null
      val code = codes.getShort(sub).toInt
      if (code < 0 || code >= ksub) return null
      val slot = sub * ksub + code
      // null LUT slot → null result (the module's null contract); a SQL
      // caller can hand any ARRAY<DOUBLE>, and silently scoring a null
      // slot as 0.0 would be a wrong answer, not an absent one
      if (lut.isNullAt(slot)) return null
      s += lut.getDouble(slot)
      sub += 1
    }
    s
  }

  /** Plan-time geometry guard shared by the PQ expressions (the SQL
    * registration path included): codes are SMALLINT, so ksub past 2¹⁵
    * would wrap at `(bestId % ksub).toShort` and every wrapped code
    * would silently never rank (adc_score rejects negatives) — recall
    * collapse with no error; and the LUT is one dense Java array, so
    * m·ksub must stay an Int.
    */
  private[functions] def requireGeometry(m: Int, ksub: Int): Unit = {
    require(m > 0 && ksub > 0, s"m and ksub must be positive, got m=$m ksub=$ksub")
    require(ksub <= 32768, s"ksub must fit SMALLINT codes (max 32768), got $ksub")
    require(m.toLong * ksub <= Int.MaxValue, s"LUT size m*ksub overflows Int: $m x $ksub")
  }

  def pq_encode(vec: Column, cents: Column, m: Int, ksub: Int): Column =
    shims.column(PqEncodeExpr(shims.expression(vec), shims.expression(cents), m, ksub))

  def pq_lut(vec: Column, cents: Column, m: Int, ksub: Int): Column =
    shims.column(PqLutExpr(shims.expression(vec), shims.expression(cents), m, ksub))

  def adc_score(lut: Column, codes: Column): Column =
    shims.column(AdcScoreExpr(shims.expression(lut), shims.expression(codes)))
}

/** pq_encode(vec, cents, m, ksub) → ARRAY<SMALLINT> of m codes. */
case class PqEncodeExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends IvfCellLike {
  PqKernels.requireGeometry(m, ksub)
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, c: Any): Any =
    PqKernels.pqEncode(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, ksub, vecFloat, centFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val out = ctx.freshName("codes")
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${l.isNull} && !${r.isNull}) {
          ArrayData $out = graft.functions.PqKernels.pqEncode(
            ${l.value}, ${r.value}, $m, $ksub, $vecFloat, $centFloat);
          if ($out != null) {
            ${ev.isNull} = false;
            ${ev.value} = $out;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeExpr =
    copy(left = l, right = r)
}

/** pq_lut(vec, cents, m, ksub) → ARRAY<DOUBLE> of m·ksub partial dots. */
case class PqLutExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends IvfCellLike {
  PqKernels.requireGeometry(m, ksub)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(v: Any, c: Any): Any =
    PqKernels.pqLut(
      v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, ksub, vecFloat, centFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val out = ctx.freshName("lut")
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        ArrayData ${ev.value} = null;
        if (!${l.isNull} && !${r.isNull}) {
          ArrayData $out = graft.functions.PqKernels.pqLut(
            ${l.value}, ${r.value}, $m, $ksub, $vecFloat, $centFloat);
          if ($out != null) {
            ${ev.isNull} = false;
            ${ev.value} = $out;
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqLutExpr =
    copy(left = l, right = r)
}

/** adc_score(lut, codes) → DOUBLE approximate dot product (m adds). */
case class AdcScoreExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ShortType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<DOUBLE> lut, ARRAY<SMALLINT> codes), got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_score"

  override def nullSafeEval(lut: Any, codes: Any): Any = {
    val r = PqKernels.adcScore(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
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
        double ${ev.value} = 0.0;
        if (!${l.isNull} && !${r.isNull}) {
          java.lang.Double $boxed = graft.functions.PqKernels.adcScore(${l.value}, ${r.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScoreExpr =
    copy(left = l, right = r)
}

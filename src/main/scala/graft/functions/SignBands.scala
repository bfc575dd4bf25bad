package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Random-hyperplane (sign) LSH band keys for cosine similarity
  * (Charikar 2002): bit_p = sign(v · h_p) where h_p is a Rademacher ±1
  * hyperplane derived deterministically from xxhash64(dim, seed=plane).
  * `bands` bands of `bitsPerBand` bits each; each band's bit pattern is
  * packed with the band index into one 64-bit key, so band equality is a
  * single long comparison / shuffle key.
  *
  * P(bit agrees) = 1 − θ/π, so banding tuned for high-cosine pairs
  * (near-duplicate detection); the exact-cosine verification join removes
  * false positives, and recall for cos ≥ 0.9 with 64×8 bits is ≈ 1.
  */
object SignBands {

  /** ±1 component of hyperplane `plane` at dimension `dim`. */
  @inline private def rademacher(plane: Int, dim: Int): Double =
    if ((XxHash64Function.hash(dim.toLong, LongType, plane.toLong) & 1L) == 0L) 1.0 else -1.0

  /** Plane matrix cache (plane-major, flat): hashing per (plane, dim) per
    * ROW would dominate the kernel (65M hash calls for 2k×64-dim at
    * 64×8 bits); the matrix is deterministic, so build it once per
    * executor and key it by (planes, dim). BOUNDED (access-order LRU,
    * 8 entries): a long-lived executor scoring corpora of varying
    * dimension or band shape must not accumulate plane matrices
    * (512 planes × 768 dims ≈ 3 MB each) for the process lifetime.
    * Rebuilding on a miss is cheap (one hash per cell) relative to any
    * kernel pass that needed the matrix.
    */
  private val planeCacheMax = 8
  private val planeCache =
    new java.util.LinkedHashMap[(Int, Int), Array[Double]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, Int), Array[Double]]): Boolean =
        size() > planeCacheMax
    }

  private def planes(nPlanes: Int, dim: Int): Array[Double] = planeCache.synchronized {
    val key = (nPlanes, dim)
    val hit = planeCache.get(key)
    if (hit != null) hit
    else {
      val m = new Array[Double](nPlanes * dim)
      var plane = 0
      while (plane < nPlanes) {
        var i = 0
        while (i < dim) { m(plane * dim + i) = rademacher(plane, i); i += 1 }
        plane += 1
      }
      planeCache.put(key, m)
      m
    }
  }

  def bandKeys(vec: ArrayData, bands: Int, bitsPerBand: Int, vecIsFloat: Boolean): ArrayData = {
    val dim = vec.numElements()
    val nPlanes = bands * bitsPerBand
    val m = planes(nPlanes, dim)
    // Hoist the vector out of ArrayData ONCE: the plane loop re-reads
    // every element nPlanes times, and per-element isNullAt/getFloat
    // virtual calls inside that hot loop cost more than the arithmetic
    // (measured ~3× on 512 planes). A flat primitive array also lets the
    // JIT vectorize the dot products. Null elements contribute 0, as
    // before.
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (!vec.isNullAt(j)) {
        v(j) = if (vecIsFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      }
      j += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    var plane = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bitsPerBand) {
        var s = 0.0
        val off = plane * dim
        var i = 0
        while (i < dim) {
          s += v(i) * m(off + i)
          i += 1
        }
        key = (key << 1) | (if (s > 0) 1L else 0L)
        r += 1
        plane += 1
      }
      // bake the band index into the key: cross-band collisions impossible
      keys(b) = key | (b.toLong << 48)
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column API: sign_bands(array<float|double>, bands, bitsPerBand). */
  def sign_bands(vec: Column, bands: Int, bitsPerBand: Int): Column =
    shims.column(SignBandsExpr(shims.expression(vec), bands, bitsPerBand))
}

case class SignBandsExpr(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression {
  require(bitsPerBand <= 48, "band index is packed above bit 48")

  private def vecIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override def nullSafeEval(input: Any): Any =
    SignBands.bandKeys(input.asInstanceOf[ArrayData], bands, bitsPerBand, vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignBands.bandKeys($c, $bands, $bitsPerBand, $vecIsFloat)")

  override protected def withNewChildInternal(newChild: Expression): SignBandsExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Fused MinHash → LSH band keys (Broder 1997 resemblance sketches;
  * banding per Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
  * ch. 3). One native pass over the shingle array computes all K minhash
  * values and folds each band's slice into a 64-bit band key.
  *
  * A higher-order-function formulation would run its lambdas
  * interpreted — K·|shingles| boxed evals per row — and the optimizer
  * pushes such projections below repartition exchanges (they're assumed
  * cheap), serializing the CPU-heavy pass onto however few partitions the
  * source file had. A single codegen'd kernel is ~100× faster per row and
  * removes the need to win that placement fight.
  */
object MinHash {

  /** All-in-one kernel: K minhashes over the shingles, folded into
    * `bands` keys of `rowsPerBand` values each (K = bands·rowsPerBand).
    * Permutation i is the standard two-hash affine family
    * h1(s) + i·h2(s) (h2 forced odd → a bijection on Z/2^64), so each
    * shingle's bytes are hashed exactly TWICE regardless of K — not K
    * full passes over the string.
    */
  def bandKeys(shingles: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val k = bands * rowsPerBand
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        val h1 = XxHash64Function.hash(s, StringType, 0x9747b28c9747b28cL)
        val h2 = XxHash64Function.hash(s, StringType, 0x85ebca6b85ebca6bL) | 1L
        var i = 0
        var h = h1
        while (i < k) {
          if (h < mins(i)) mins(i) = h
          h += h2 // = h1 + (i+1)*h2, wrapping
          i += 1
        }
      }
      j += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var r = 0
      while (r < rowsPerBand) {
        acc = XxHash64Function.hash(mins(b * rowsPerBand + r), LongType, acc)
        r += 1
      }
      keys(b) = acc
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column API: minhash_bands(array<string>, bands, rowsPerBand) →
    * array<long> of band keys.
    */
  def minhash_bands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    shims.column(MinHashBandsExpr(shims.expression(shingles), bands, rowsPerBand))
}

case class MinHashBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHash.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHash.bandKeys($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

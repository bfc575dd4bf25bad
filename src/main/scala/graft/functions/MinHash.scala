package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
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

  /** K minhash values over the shingles. Permutation i is the standard
    * two-hash affine family h1(s) + i·h2(s) (h2 forced odd → a bijection
    * on Z/2^64), so each shingle's bytes are hashed exactly TWICE
    * regardless of K — not K full passes over the string.
    */
  def minhashValues(shingles: ArrayData, k: Int): Array[Long] = {
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
    mins
  }

  /** Fold a K-value signature into `bands` 64-bit band keys of
    * K/bands rows each (xxhash64 chain, seed 42). `bands` must divide
    * the signature length — silent integer-division truncation would
    * drop trailing signature positions and weaken LSH recall without
    * any visible failure.
    */
  def foldBands(mins: Array[Long], bands: Int): Array[Long] = {
    require(mins.length % bands == 0,
      s"bands ($bands) must divide the signature length (${mins.length}); " +
        "truncating would silently drop signature positions")
    val rowsPerBand = mins.length / bands
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
    keys
  }

  /** All-in-one kernel: K minhashes folded into band keys
    * (K = bands·rowsPerBand). Kept for callers that never need the raw
    * signature; identical keys to minhashSig → bandsFromSig.
    */
  def bandKeys(shingles: ArrayData, bands: Int, rowsPerBand: Int): ArrayData =
    new GenericArrayData(foldBands(minhashValues(shingles, bands * rowsPerBand), bands))

  /** Kernel entry points for the split signature → bands pipeline. */
  def sigKernel(shingles: ArrayData, k: Int): ArrayData =
    new GenericArrayData(minhashValues(shingles, k))

  def bandsKernel(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val mins = new Array[Long](k)
    var i = 0
    while (i < k) { mins(i) = sig.getLong(i); i += 1 }
    new GenericArrayData(foldBands(mins, bands))
  }

  /** Fraction of positions where two equal-length signatures agree —
    * the unbiased MinHash estimator of Jaccard similarity.
    */
  def overlapFrac(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** Column API: minhash_bands(array<string>, bands, rowsPerBand) →
    * array<long> of band keys.
    */
  def minhash_bands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    shims.column(MinHashBandsExpr(shims.expression(shingles), bands, rowsPerBand))

  /** Column API: minhash_sig(array<string>, k) → array<long> signature. */
  def minhash_sig(shingles: Column, k: Int): Column =
    shims.column(MinHashSigExpr(shims.expression(shingles), k))

  /** Column API: bands_from_sig(array<long>, bands) → array<long> keys. */
  def bands_from_sig(sig: Column, bands: Int): Column =
    shims.column(BandsFromSigExpr(shims.expression(sig), bands))

  /** Column API: sig_overlap(array<long>, array<long>) → double in [0,1],
    * the signature-estimated Jaccard.
    */
  def sig_overlap(a: Column, b: Column): Column =
    shims.column(SigOverlapExpr(shims.expression(a), shims.expression(b)))
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

/** Raw K-value minhash signature (array<long>), codegen'd. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHash.sigKernel(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.sigKernel($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Band keys from a precomputed signature (cheap xxhash fold), codegen'd. */
case class BandsFromSigExpr(child: Expression, bands: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bands_from_sig requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bands_from_sig"

  override def nullSafeEval(input: Any): Any =
    MinHash.bandsKernel(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.bandsKernel($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): BandsFromSigExpr =
    copy(child = newChild)
}

/** Signature-estimated Jaccard: fraction of agreeing positions. */
case class SigOverlapExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sig_overlap requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sig_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHash.overlapFrac(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHash.overlapFrac($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigOverlapExpr =
    copy(left = l, right = r)
}

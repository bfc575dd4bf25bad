package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * composed from higher-order built-ins (`zip_with` + `aggregate`).
  * SQL-expressible — the DuckDB oracle reproduces every result
  * bit-for-bit (all arithmetic in double, sequential left-to-right
  * accumulation in both engines) — which is why these formulations
  * define the reference SEMANTICS.
  *
  * NOT the hot path: higher-order-function lambdas run INTERPRETED
  * (no whole-stage codegen) and the optimizer may push them below
  * exchanges. The fused native kernels in [[VectorKernels]] are the
  * 100 TB executors of the same semantics (bit-identical results,
  * ~100x faster per row); [[graft.ops.Similarity]] uses those.
  */
object VectorFunctions {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; null if either norm is 0. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(null).cast("double")).otherwise(d / (na * nb))
  }

  /** Squared L2 distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)
}

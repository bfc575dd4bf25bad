package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` / `array<double>` embedding columns,
  * composed from higher-order built-ins (`zip_with` + `aggregate`) so it
  * stays codegen'd and SQL-expressible — the DuckDB oracle can reproduce
  * every result bit-for-bit (all arithmetic in double, sequential
  * left-to-right accumulation in both engines).
  *
  * For the 100 TB path these are the per-row kernels of
  * [[graft.ops.Similarity]]; they are O(dim) with no allocation beyond the
  * zipped array. A custom fused Catalyst expression (single loop, no
  * intermediate array) is the next optimization step if profiling demands.
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

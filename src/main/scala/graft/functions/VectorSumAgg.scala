package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Element-wise vector sum over an `array<float|double>` column, as a
  * partial-combining aggregate: each input partition folds its vectors
  * into ONE dim-length accumulator before the exchange, so a grouped
  * mean over n vectors shuffles groups·dim values instead of n·dim.
  *
  * This is the recenter kernel for k-means ([[graft.ops.Similarity
  * .kmeansCentroids]]): the `posexplode → groupBy(cell, dim)`
  * formulation it replaces shuffles every (row, dim) pair — a dim×
  * blow-up of the corpus per Lloyd iteration — where this aggregate's
  * exchange carries one partially-summed vector per (partition × cell).
  *
  * Null vectors and null elements are skipped (sum of an all-null group
  * is an empty array); a length mismatch within a group throws —
  * silently mixing dimensionalities is always caller error.
  */
case class VectorSum(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSum.Buf] {

  private lazy val elemFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(vec)

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_sum requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_sum"

  override def createAggregationBuffer(): VectorSum.Buf = new VectorSum.Buf

  override def update(buf: VectorSum.Buf, input: InternalRow): VectorSum.Buf = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else require(buf.sums.length == n,
        s"vector_sum: mixed dimensions ${buf.sums.length} vs $n in one group")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += (if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: VectorSum.Buf, other: VectorSum.Buf): VectorSum.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = other.sums.clone()
      else {
        require(buf.sums.length == other.sums.length,
          s"vector_sum: mixed dimensions ${buf.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      }
    }
    buf
  }

  override def eval(buf: VectorSum.Buf): Any =
    if (buf.sums == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(buf.sums.map(x => x: Any))

  override def serialize(buf: VectorSum.Buf): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSum.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new VectorSum.Buf
    if (n >= 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSum =
    copy(vec = newChildren(0))
}

object VectorSum {
  /** Mutable accumulator; `sums == null` until the first vector fixes
    * the dimensionality.
    */
  final class Buf { var sums: Array[Double] = null }

  /** Column API: element-wise sum of the group's vectors as array<double>. */
  def vector_sum(vec: Column): Column =
    shims.column(VectorSum(shims.expression(vec)).toAggregateExpression())
}

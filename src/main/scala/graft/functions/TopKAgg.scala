package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: at most k (score, id) entries kept sorted
  * best-first under the total order (score DESC, id ASC) — the exact
  * order `row_number() OVER (ORDER BY score DESC, id ASC)` ranks by, so
  * an aggregate built on it reproduces the window formulation
  * bit-for-bit while never holding more than k entries.
  *
  * Insertion is a binary search + arraycopy shift, O(log k + k) worst
  * case; once full, candidates not beating the current worst entry are
  * rejected in O(1) — the common case on a big corpus, where almost
  * every scored row loses to the running top-k.
  */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  /** Score comparison with Spark's window sort semantics
    * (`nanSafeCompareDoubles`): NaN ranks GREATER than every value
    * (so `ORDER BY score DESC` puts it first) and -0.0 == 0.0. Raw
    * `>`/`==` would silently drop or misplace NaN scores depending on
    * arrival order — the aggregate must stay bit-identical to the
    * window formulation even on NaN inputs.
    */
  @inline private def scoreCmp(s1: Double, s2: Double): Int =
    if (s1 == s2) 0
    else {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 && n2) 0
      else if (n1) 1
      else if (n2) -1
      else if (s1 > s2) 1
      else -1
    }

  /** True if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = scoreCmp(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (size == k) {
      if (!beats(score, id, scores(size - 1), ids(size - 1))) return
      size -= 1
    }
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(scores(mid), ids(mid), score, id)) lo = mid + 1 else hi = mid
    }
    System.arraycopy(scores, lo, scores, lo + 1, size - lo)
    System.arraycopy(ids, lo, ids, lo + 1, size - lo)
    scores(lo) = score
    ids(lo) = id
    size += 1
  }
}

/** Partial top-k aggregate: `top_k_by_score(score, id, k)` returns the k
  * best (id, score) pairs per group as `array<struct<neighbor_id, cosine>>`
  * sorted best-first, under the deterministic order (score DESC, id ASC).
  *
  * This is the scale-path replacement for ranking scored pairs with a
  * `row_number()` window: the window formulation shuffles EVERY scored
  * row (|Q|·|corpus| pairs for a brute-force kNN) to sort each group,
  * while this aggregate runs map-side inside ObjectHashAggregate partial
  * mode, so the exchange carries at most one k-entry buffer per
  * (input partition × group) — ≈ partitions·|Q|·k rows instead of
  * |Q|·|corpus|. Null scores/ids are skipped (a null cosine — zero-norm
  * vector — can never rank).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType || id.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score requires (DOUBLE score, BIGINT id), got " +
          s"${score.dataType.sql}, ${id.dataType.sql}")
    } else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType)) {
      TypeCheckResult.TypeCheckFailure("top_k_by_score: k must be an integer literal")
    } else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0) {
      TypeCheckResult.TypeCheckFailure("top_k_by_score: k must be a positive literal")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      out(i) = InternalRow(buffer.ids(i), buffer.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.k)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      // entries arrive already sorted → each lands at the end, O(1) shift
      buf.insert(bb.getDouble(), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

/** String-keyed sibling of [[TopKBuffer]]: ids are UTF8Strings ordered
  * by their binary comparison — exactly the order Spark's sort (and the
  * window formulation's `id ASC` tie-break) applies to StringType, so
  * the two key shapes share one ranking contract.
  *
  * Inserted ids are CLONED on acceptance: an eval'd UTF8String may point
  * into a row buffer the scan reuses, and a retained reference would
  * silently mutate under the heap. Cloning only on acceptance keeps the
  * common reject path (almost every row on a big corpus) allocation-free.
  */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  var size: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[UTF8String] = new Array[UTF8String](k)

  @inline private def scoreCmp(s1: Double, s2: Double): Int =
    if (s1 == s2) 0
    else {
      val n1 = java.lang.Double.isNaN(s1)
      val n2 = java.lang.Double.isNaN(s2)
      if (n1 && n2) 0
      else if (n1) 1
      else if (n2) -1
      else if (s1 > s2) 1
      else -1
    }

  @inline private def beats(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean = {
    val c = scoreCmp(s1, s2)
    c > 0 || (c == 0 && i1.compareTo(i2) < 0)
  }

  /** `owned` = false when `id` may alias reused row memory (the update
    * path); accepted entries are cloned. Merge/deserialize pass true.
    */
  def insert(score: Double, id: UTF8String, owned: Boolean): Unit = {
    if (size == k) {
      if (!beats(score, id, scores(size - 1), ids(size - 1))) return
      size -= 1
    }
    var lo = 0
    var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (beats(scores(mid), ids(mid), score, id)) lo = mid + 1 else hi = mid
    }
    System.arraycopy(scores, lo, scores, lo + 1, size - lo)
    System.arraycopy(ids, lo, ids, lo + 1, size - lo)
    scores(lo) = score
    // NOT UTF8String.clone(): when the string exactly spans its backing
    // byte[] (getBytes' no-copy fast path), clone() returns an ALIAS of
    // the same array — an explicit copy is the only safe ownership
    ids(lo) = if (owned) id else {
      val b = new Array[Byte](id.numBytes)
      id.writeToMemory(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
      UTF8String.fromBytes(b)
    }
    size += 1
  }
}

/** [[TopKByScore]] for STRING ids — the same bounded-heap partial
  * aggregate, so string-keyed corpora (doc UUIDs, URLs) get the
  * map-side-fold top-k path instead of silently falling back to the
  * scored-pair `row_number` window shuffle. Identical ranking contract:
  * (score DESC NaN-greatest, id ASC by binary order), null score or id
  * skipped.
  */
case class TopKByScoreStr(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {
  import org.apache.spark.unsafe.types.UTF8String

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType || id.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score_str requires (DOUBLE score, STRING id), got " +
          s"${score.dataType.sql}, ${id.dataType.sql}")
    } else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType)) {
      TypeCheckResult.TypeCheckFailure("top_k_by_score_str: k must be an integer literal")
    } else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0) {
      TypeCheckResult.TypeCheckFailure("top_k_by_score_str: k must be a positive literal")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", StringType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score_str"

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buffer: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null)
        buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[UTF8String], owned = false)
    }
    buffer
  }

  override def merge(buffer: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.insert(other.scores(i), other.ids(i), owned = true)
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKStrBuffer): Any = {
    val out = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) {
      out(i) = InternalRow(buffer.ids(i), buffer.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKStrBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buffer.size) { bytes += buffer.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buffer.size * 12 + bytes)
    bb.putInt(buffer.k)
    bb.putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      val b = buffer.ids(i).getBytes
      bb.putInt(b.length)
      bb.put(b)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val b = new Array[Byte](bb.getInt())
      bb.get(b)
      // entries arrive already sorted → each lands at the end, O(1) shift
      buf.insert(s, UTF8String.fromBytes(b), owned = true)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKAgg {
  /** Column API: top-k (id, score) pairs per group, best-first. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    shims.column(
      TopKByScore(shims.expression(score), shims.expression(id), Literal(k))
        .toAggregateExpression())

  /** String-id variant — same ranking contract, UTF8String binary order. */
  def top_k_by_score_str(score: Column, id: Column, k: Int): Column =
    shims.column(
      TopKByScoreStr(shims.expression(score), shims.expression(id), Literal(k))
        .toAggregateExpression())
}

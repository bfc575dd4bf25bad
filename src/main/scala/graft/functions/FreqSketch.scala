package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form Agarwal et al. 2013): at most k (item, weight) counters.
  *
  * Streaming update: a tracked item increments; an untracked item takes
  * a free slot, or — when all k slots are busy — every counter
  * decrements by one and zeros drop (the classic pigeonhole step).
  * Merge: counters add; if more than k survive, all decrement by the
  * (k+1)-th largest weight and ≤0 drop.
  *
  * Guarantee (both forms): for every item,
  * `true_count - N/(k+1) <= weight <= true_count`, so every item with
  * frequency above N/(k+1) is GUARANTEED present — that invariant is
  * deterministic even though the weights (and the tail of the candidate
  * set) depend on partitioning/merge order. Oracled queries must
  * therefore gate on the guarantee (membership of true heavy hitters),
  * never on raw weights.
  */
private[functions] object FreqSketch {
  /** Integral items are accepted and widened to BIGINT at eval — the
    * usability INT columns deserve (`count_min(int_col, 4, 256)` just
    * works, like Spark's own integral widening). STRINGS stay rejected:
    * a silent string→number coercion would null out unparseable items
    * and corrupt the hash domain without a diagnostic.
    */
  def integralItem(item: Expression): Boolean = item.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[Long, Long](k * 2)

  def updateOne(item: Long): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // pigeonhole decrement; O(k) on a miss — the textbook form. (The
      // amortized-O(1) variant keeps a global offset; k here is
      // hundreds, and the constant is a hash-map sweep.)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(other: MgBuffer): Unit = {
    val oit = other.counts.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      counts.put(e.getKey, counts.get(e.getKey) + e.getValue)
    }
    if (counts.size > k) {
      // decrement everything by the (k+1)-th largest weight
      val ws = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { ws(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val cut = ws(ws.length - k - 1) // (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }
}

/** `misra_gries(item, k)` — bounded-space frequent-items aggregate over
  * an integral column (INT and narrower widen to BIGINT; strings are
  * rejected): the one-pass heavy-hitters scale path. The exact
  * alternative (groupBy item + count + filter) shuffles the full
  * per-key count table; this aggregate's exchange carries at most k
  * counters per partition regardless of key cardinality, so a 100 TB
  * scan with billions of distinct keys still reduces to KBs.
  *
  * Returns `array<struct<item BIGINT, weight BIGINT>>` sorted
  * (weight DESC, item ASC). Weights UNDERESTIMATE true counts by at
  * most N/(k+1) (see [[MgBuffer]]); callers wanting exact counts
  * semi-join the candidates back against the data (the standard
  * two-pass pattern) — see the x17 query.
  */
case class MisraGries(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(item, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!FreqSketch.integralItem(item)) {
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires an integral item (widened to BIGINT), got ${item.dataType.sql}")
    } else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType)) {
      TypeCheckResult.TypeCheckFailure("misra_gries: k must be an integer literal")
    } else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0) {
      TypeCheckResult.TypeCheckFailure("misra_gries: k must be a positive literal")
    } else {
      TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buffer.updateOne(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val n = buffer.counts.size
    val items = new Array[Long](n)
    val weights = new Array[Long](n)
    val idx = Array.range(0, n)
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      items(i) = e.getKey
      weights(i) = e.getValue
      i += 1
    }
    // deterministic presentation order: weight DESC, item ASC
    val order = idx.sortBy(j => (-weights(j), items(j)))
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = InternalRow(items(order(i)), weights(order(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.counts.size * 16)
    bb.putInt(buffer.k)
    bb.putInt(buffer.counts.size)
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.counts.put(bb.getLong(), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(item = newChildren(0), kExpr = newChildren(1))
}

object CountMin {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-j bucket for an item: the first 4 bytes of md5("j:item") as an
    * unsigned 32-bit value, mod width. EXACTLY the value SQL computes as
    * `conv(substr(md5(concat(j, ':', item)), 1, 8), 16, 10) % width` —
    * the sketch is warehouse-replayable (DuckDB spells it
    * `('0x' || substr(md5(...), 1, 8))::BIGINT % width`), which is what
    * lets an oracle recompute every counter exactly.
    */
  def bucket(j: Int, item: Long, width: Int): Int = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s"$j:$item".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val u = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
      ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
    (u % width).toInt
  }
}

/** Count-Min buffer: depth×width additive counters, row-major. Because
  * every cell is a pure SUM, the merged sketch is bit-identical under ANY
  * partitioning / merge order — unlike Misra–Gries weights, CMS counters
  * themselves are oracle-safe.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)

  def updateOne(item: Long): Unit = {
    var j = 0
    while (j < depth) {
      counters(j * width + CountMin.bucket(j, item, width)) += 1L
      j += 1
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += other.counters(i); i += 1 }
  }
}

/** `count_min(item, depth, width)` — Count-Min sketch (Cormode &
  * Muthukrishnan 2005) over an integral column (INT and narrower widen
  * to BIGINT; strings are rejected): the point-frequency
  * complement of [[MisraGries]]'s membership summary. The exchange
  * carries depth·width counters per partition (KBs) regardless of key
  * cardinality; a point estimate is `min_j counters[j][h_j(x)]`, which
  * NEVER underestimates and overestimates by ≤ 2N/width with
  * probability ≥ 1 − 2^−depth.
  *
  * Returns the raw counter array (`array<bigint>`, length depth·width,
  * row-major) rather than hiding estimation behind another custom
  * function: the hash recipe is plain `md5` (see [[CountMin.bucket]]),
  * so estimation is an ordinary SQL projection over `element_at` and the
  * whole sketch replays exactly in any warehouse.
  */
case class CountMinSketch(
    item: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(item, depthExpr, widthExpr)

  private def posIntLit(e: Expression, name: String): Option[TypeCheckResult] = {
    if (!e.foldable || !(e.dataType == IntegerType || e.dataType == LongType))
      Some(TypeCheckResult.TypeCheckFailure(s"count_min: $name must be an integer literal"))
    else if (e.eval() == null || e.eval().asInstanceOf[Number].intValue() <= 0)
      Some(TypeCheckResult.TypeCheckFailure(s"count_min: $name must be a positive literal"))
    else None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!FreqSketch.integralItem(item)) {
      TypeCheckResult.TypeCheckFailure(
        s"count_min requires an integral item (widened to BIGINT), got ${item.dataType.sql}")
    } else {
      posIntLit(depthExpr, "depth").orElse(posIntLit(widthExpr, "width")).getOrElse {
        if (depthExpr.eval().asInstanceOf[Number].longValue() *
            widthExpr.eval().asInstanceOf[Number].longValue() > (1L << 24))
          TypeCheckResult.TypeCheckFailure(
            "count_min: depth*width exceeds 2^24 counters (the sketch must stay KB-scale)")
        else TypeCheckResult.TypeCheckSuccess
      }
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = item.eval(input)
    if (v != null) buffer.updateOne(v.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any = new GenericArrayData(buffer.counters)

  override def serialize(buffer: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.counters.length * 8)
    bb.putInt(buffer.depth)
    bb.putInt(buffer.width)
    var i = 0
    while (i < buffer.counters.length) { bb.putLong(buffer.counters(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.counters.length) { buf.counters(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(item = newChildren(0), depthExpr = newChildren(1), widthExpr = newChildren(2))
}

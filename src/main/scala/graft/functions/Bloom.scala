package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._

/** Standard Bloom filter (Bloom 1970) over 64-bit hashes, with
  * Kirsch–Mitzenmacher double hashing (2006): the k probe positions are
  * `h1 + i·h2 mod numBits`, where h1 is the input hash and h2 a fmix64
  * re-mix of it — k independent-enough probes from ONE hash evaluation,
  * the construction Guava/Spark's own BloomFilterImpl use.
  *
  * Why a graft-native filter instead of `DataFrameStatFunctions
  * .bloomFilter`: that API collects the filter to the DRIVER and returns
  * a local object — unusable inside a plan without re-broadcasting by
  * hand, and its buffer is not reachable from SQL. Here the filter is an
  * AGGREGATE VALUE (one BINARY row): it builds distributed (per-partition
  * bitsets OR-merged in the exchange), stays in the plan as a one-row
  * broadcast, writes to a table like any other artifact, and both sides
  * are on the SQL surface (`bloom_agg` / `bloom_contains`).
  *
  * Determinism: OR is commutative, associative, and idempotent, so the
  * built bitset is BYTE-IDENTICAL under any partitioning, merge order,
  * or input duplication — unlike sketches whose state depends on merge
  * order (Misra–Gries), a Bloom filter needs no guarantee-style oracle.
  *
  * Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k; at m/n = 10
  * bits/element and k = 7 that is ≈ 0.8%. The serialized filter is
  * m/8 bytes regardless of element count or width — the point of the
  * structure: a 10⁸-element eval-shingle set at 10 bits/element is
  * 125 MB of bitset vs many GB of strings.
  */
object Bloom {

  /** MurmurHash3 fmix64 finalizer — the avalanche mix that derives the
    * probe stride h2 from the input hash. Public constant algorithm
    * (Appleby, public domain).
    */
  @inline def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Set the k probe bits for `hash` in `words` (numBits bits). */
  def setBits(words: Array[Long], numBits: Int, numHashes: Int, hash: Long): Unit = {
    val h2 = fmix64(hash) | 1L // odd stride: never degenerates to one probe
    var i = 0
    var h = hash
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h, numBits.toLong).toInt
      words(bit >>> 6) |= 1L << (bit & 63)
      h += h2
      i += 1
    }
  }

  /** Membership probe against the SERIALIZED filter layout
    * ([[BloomAgg]]'s output): int numBits, int numHashes, then the
    * bitset words big-endian. Reads bytes in place — no buffer copy per
    * row. False positives possible; false negatives never.
    */
  def containsKernel(bytes: Array[Byte], hash: Long): Boolean = {
    val numBits = readInt(bytes, 0)
    val numHashes = readInt(bytes, 4)
    val h2 = fmix64(hash) | 1L
    var i = 0
    var h = hash
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h, numBits.toLong).toInt
      val word = readLong(bytes, 8 + ((bit >>> 6) << 3))
      if ((word & (1L << (bit & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  @inline private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  @inline private def readLong(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 56) | ((b(off + 1) & 0xffL) << 48) |
      ((b(off + 2) & 0xffL) << 40) | ((b(off + 3) & 0xffL) << 32) |
      ((b(off + 4) & 0xffL) << 24) | ((b(off + 5) & 0xffL) << 16) |
      ((b(off + 6) & 0xffL) << 8) | (b(off + 7) & 0xffL)

  def serialize(buf: BloomBuffer): Array[Byte] = {
    val out = new Array[Byte](8 + buf.words.length * 8)
    writeInt(out, 0, buf.numBits)
    writeInt(out, 4, buf.numHashes)
    var i = 0
    while (i < buf.words.length) {
      writeLong(out, 8 + i * 8, buf.words(i))
      i += 1
    }
    out
  }

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer(readInt(bytes, 0), readInt(bytes, 4))
    var i = 0
    while (i < buf.words.length) {
      buf.words(i) = readLong(bytes, 8 + i * 8)
      i += 1
    }
    buf
  }

  @inline private def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  @inline private def writeLong(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
  }

  /** Column API: build the filter over a BIGINT hash column. One BINARY
    * value; group GLOBALLY (or by a low-cardinality key — each group
    * holds a numBits/8-byte buffer per partition during the partial
    * phase, so per-key filters over high-cardinality keys are the wrong
    * tool; use a join).
    */
  def bloom_agg(hash: Column, numBits: Int, numHashes: Int = 7): Column =
    shims.column(
      BloomAgg(shims.expression(hash), Literal(numBits), Literal(numHashes))
        .toAggregateExpression())

  /** Column API: membership probe. */
  def bloom_contains(bloom: Column, hash: Column): Column =
    shims.column(BloomMightContain(shims.expression(bloom), shims.expression(hash)))
}

/** Mutable build-side state: the raw bitset words. */
final class BloomBuffer(val numBits: Int, val numHashes: Int) {
  val words = new Array[Long]((numBits + 63) >>> 6)

  def put(hash: Long): Unit = Bloom.setBits(words, numBits, numHashes, hash)

  def mergeFrom(other: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

/** `bloom_agg(hash, numBits, numHashes)` — distributed Bloom-filter
  * build over a BIGINT hash column. Each partition folds its rows into
  * a local bitset; the exchange carries one numBits/8-byte buffer per
  * (partition × group) and merge is bitwise OR — so a 100 TB scan
  * reduces to a fixed-size filter with no per-key shuffle. NULL hashes
  * are skipped (they can never be probed).
  */
case class BloomAgg(
    hash: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {

  private lazy val numBits: Int = numBitsExpr.eval().asInstanceOf[Number].intValue()
  private lazy val numHashes: Int = numHashesExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(hash, numBitsExpr, numHashesExpr)

  override def checkInputDataTypes(): TypeCheckResult = {
    def posIntLiteral(e: Expression, name: String, max: Int): Option[String] =
      if (!e.foldable || !(e.dataType == IntegerType || e.dataType == LongType))
        Some(s"bloom_agg: $name must be an integer literal")
      else if (e.eval() == null || e.eval().asInstanceOf[Number].longValue() <= 0 ||
        e.eval().asInstanceOf[Number].longValue() > max)
        Some(s"bloom_agg: $name must be in [1, $max]")
      else None
    if (hash.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg requires a BIGINT hash (use xxhash64(...)), got ${hash.dataType.sql}")
    else
      posIntLiteral(numBitsExpr, "numBits", Int.MaxValue - 64)
        .orElse(posIntLiteral(numHashesExpr, "numHashes", 64))
        .map(TypeCheckResult.TypeCheckFailure)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = hash.eval(input)
    if (v != null) buffer.put(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: BloomBuffer): Any = Bloom.serialize(buffer)

  override def serialize(buffer: BloomBuffer): Array[Byte] = Bloom.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): BloomBuffer = Bloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(hash = newChildren(0), numBitsExpr = newChildren(1),
      numHashesExpr = newChildren(2))
}

/** `bloom_contains(filter, hash)` — codegen membership probe against a
  * serialized [[BloomAgg]] filter. May return true for an absent hash
  * (false positive, rate set by the build sizing); never false for a
  * present one. The filter operand is typically a one-row aggregate
  * result cross-joined in as a broadcast — evaluated per row as a plain
  * byte-array read, no deserialization.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (BINARY, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(filter: Any, hash: Any): Any =
    Bloom.containsKernel(filter.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (f, h) => s"graft.functions.Bloom.containsKernel($f, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A deterministic Bloom filter over string keys, built as first-class
  * Catalyst pieces so the filter itself is an aggregate:
  *
  *  - [[BloomPositions]] maps a key to its k bit positions (pure,
  *    per-row, map-side);
  *  - [[BloomFilterAgg]] ORs positions into an `mBits`-bit bitmap with
  *    full partial aggregation — each task builds a local bitmap and
  *    only `numPartitions × mBits/8` bytes ever shuffle, never keys;
  *  - [[BloomContains]] probes a (broadcast) bitmap.
  *
  * The hash family is double hashing (Kirsch–Mitzenmacher 2006):
  * h_i = h1 + i·h2 with h1 = FNV-1a64(key) (Sketch.fnv1a64 — the same
  * kernel the minhash sketches use, already bit-replicated in DuckDB
  * SQL) and h2 = (h1·A + B) | 1 from the seeded affine-mixer family.
  * `mBits` must be a power of two: the position is the wrapped sum's
  * low bits, which makes JVM wrapping arithmetic and the oracle's
  * HUGEINT mod-2^64 arithmetic agree exactly.
  */
case class BloomPositions(child: Expression, k: Int, mBits: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0, s"k must be positive, got $k")
  require(mBits > 0 && (mBits & (mBits - 1)) == 0,
    s"mBits must be a power of two, got $mBits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  @transient private lazy val (mixA, mixB) = {
    val (a, b) = Sketch.mixers(1)
    (a(0), b(0))
  }

  override def nullSafeEval(input: Any): Any = {
    val h1 = Sketch.fnv1a64(input.asInstanceOf[UTF8String].toString)
    val h2 = (h1 * mixA + mixB) | 1L
    val mask = (mBits - 1).toLong
    val out = new Array[Int](k)
    var i = 0
    while (i < k) {
      out(i) = ((h1 + i * h2) & mask).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "bloom_positions"
}

/** bloom_filter_agg(positions) → array<bigint> bitmap of mBits/64
  * words. Buffers are plain long arrays; merge is a word-wise OR.
  */
case class BloomFilterAgg(
    child: Expression,
    mBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")
  private val words = mBits / 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected array<int>, got $o")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  @transient private lazy val fastOrdinal: Option[Int] = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType.isInstanceOf[ArrayType] => Some(b.ordinal)
    case _ => None
  }

  private def setBits(buffer: Array[Long], pos: ArrayData): Unit = {
    var i = 0
    val n = pos.numElements()
    while (i < n) {
      val p = pos.getInt(i)
      buffer(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    fastOrdinal match {
      case Some(o) =>
        if (!input.isNullAt(o)) setBits(buffer, input.getArray(o))
      case None =>
        val v = child.eval(input)
        if (v != null) setBits(buffer, v.asInstanceOf[ArrayData])
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))

  override def prettyName: String = "bloom_filter_agg"
}

/** bloom_contains(bitmap, positions) → true iff every position's bit
  * is set (no false negatives; false-positive rate set by mBits/k
  * against the inserted-key count).
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (array<bigint>, array<int>), got ($l, $r)")
    }

  override def nullSafeEval(bm: Any, pos: Any): Any = {
    val bitmap = bm.asInstanceOf[ArrayData]
    val ps = pos.asInstanceOf[ArrayData]
    var i = 0
    val n = ps.numElements()
    while (i < n) {
      val p = ps.getInt(i)
      if ((bitmap.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}

object Bloom {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def positions(key: Column, k: Int, mBits: Int): Column =
    column(BloomPositions(expression(key), k, mBits))

  def filterAgg(positions: Column, mBits: Int): Column =
    column(BloomFilterAgg(expression(positions), mBits)
      .toAggregateExpression())

  def mightContain(bitmap: Column, positions: Column): Column =
    column(BloomContains(expression(bitmap), expression(positions)))

  /** The (A, B) mixer constants h2 derives from — single source for
    * the kernel AND external bit-exact re-implementations (oracle).
    */
  def h2Mixer: (Long, Long) = {
    val (a, b) = Sketch.mixers(1)
    (a(0), b(0))
  }
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded order-statistic accumulator: the k SMALLEST string keys
  * seen under UTF8String order (Spark's own binary/code-point string
  * order — NOT java.lang.String's UTF-16 order, which disagrees for
  * supplementary-plane characters), duplicates kept, so
  * `array_position(result, key)` reproduces `row_number()` rank over
  * the key order for distinct keys.
  *
  * This replaces the `row_number().over(Window.partitionBy(stratum))`
  * idiom in deterministic sampling: a window shuffles the ENTIRE
  * dataset into |strata| partitions and sorts each — with a handful of
  * strata over a 100 TB corpus those few tasks are the job. As a
  * TypedImperativeAggregate the buffer participates in map-side
  * partial aggregation: each task keeps at most k keys per stratum and
  * only `numPartitions × |strata| × k` keys shuffle.
  */
final class MinKeysBuffer(val k: Int) {
  // head = LARGEST kept key, so eviction is O(log k)
  private[functions] val heap = new java.util.PriorityQueue[UTF8String](
    math.max(k, 1), java.util.Collections.reverseOrder[UTF8String]())

  /** Insert a key; the value is cloned (eval results may alias reused
    * row buffers).
    */
  def insert(key: UTF8String): Unit = {
    if (heap.size < k) heap.add(key.clone())
    else if (key.compareTo(heap.peek()) < 0) {
      heap.poll(); heap.add(key.clone())
    }
  }

  /** Kept keys, ascending. */
  def sorted: Array[UTF8String] = {
    val arr = heap.toArray(new Array[UTF8String](heap.size))
    java.util.Arrays.sort(arr, java.util.Comparator.naturalOrder[UTF8String]())
    arr
  }
}

/** min_keys(key, k) → array<string> of the k smallest keys, ascending. */
case class MinKeys(
    keyExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKeysBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(keyExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = keyExpr.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"min_keys expects string, got $o")
  }

  override def createAggregationBuffer(): MinKeysBuffer = new MinKeysBuffer(k)

  override def update(buffer: MinKeysBuffer, input: InternalRow): MinKeysBuffer = {
    val v = keyExpr.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MinKeysBuffer, other: MinKeysBuffer): MinKeysBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.insert(it.next())
    buffer
  }

  override def eval(buffer: MinKeysBuffer): Any =
    new GenericArrayData(buffer.sorted.map(s => s: Any))

  override def serialize(buffer: MinKeysBuffer): Array[Byte] = {
    val keys = buffer.sorted.map(_.getBytes)
    val bb = ByteBuffer.allocate(4 + keys.map(_.length + 4).sum)
    bb.putInt(keys.length)
    keys.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKeysBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKeysBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.insert(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKeys =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKeys =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKeys =
    copy(keyExpr = newChildren(0))

  override def prettyName: String = "min_keys"
}

object MinKeysAgg {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def minKeys(key: Column, k: Int): Column =
    column(MinKeys(expression(key), k).toAggregateExpression())
}

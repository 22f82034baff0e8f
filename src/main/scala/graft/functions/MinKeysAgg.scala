package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded order-statistic accumulator: the k LEXICOGRAPHICALLY
  * SMALLEST string keys seen, duplicates kept (so
  * `array_position(result, key)` reproduces `row_number()` rank over
  * the key order for distinct keys).
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
  private[functions] val heap = new java.util.PriorityQueue[String](
    math.max(k, 1), java.util.Collections.reverseOrder[String]())

  def insert(key: String): Unit = {
    if (heap.size < k) heap.add(key)
    else if (key.compareTo(heap.peek()) < 0) { heap.poll(); heap.add(key) }
  }

  /** Kept keys, ascending. */
  def sorted: Array[String] = {
    val arr = heap.toArray(new Array[String](heap.size))
    scala.util.Sorting.quickSort(arr)
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
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MinKeysBuffer, other: MinKeysBuffer): MinKeysBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) buffer.insert(it.next())
    buffer
  }

  override def eval(buffer: MinKeysBuffer): Any =
    new GenericArrayData(
      buffer.sorted.map(s => UTF8String.fromString(s): Any))

  override def serialize(buffer: MinKeysBuffer): Array[Byte] = {
    val keys = buffer.sorted.map(_.getBytes(StandardCharsets.UTF_8))
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
      buf.insert(new String(b, StandardCharsets.UTF_8))
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

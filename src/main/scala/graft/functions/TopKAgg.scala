package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the k (score, id) pairs with the highest
  * score (ties broken toward the smaller id), kept in a size-k heap.
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(queryId))` rank idiom in ANN
  * search: a window shuffles EVERY scored candidate into |queries|
  * partitions and sorts them — with few queries over a large corpus
  * that single stage is the job's straggler. As a
  * TypedImperativeAggregate the heap participates in partial (map-side)
  * aggregation: each task reduces its candidates to at most k per
  * query locally, and only `numPartitions × |queries| × k` heap entries
  * ever cross the wire. No full-data shuffle, no sort.
  *
  * Duplicate ids (e.g. the same candidate surfacing from several
  * multiprobe LSH buckets) are collapsed at insert, keeping the best
  * score — callers need no `distinct()` pre-pass (which would itself
  * shuffle every candidate).
  */
final class TopKBuffer(val k: Int) {
  // head = WORST kept candidate (smallest score, then largest id) so
  // eviction is O(log k)
  private[functions] val heap = new java.util.PriorityQueue[TopKBuffer.Cand](
    math.max(k, 1), TopKBuffer.worstFirst)
  // id → score of entries currently in the heap (multiprobe dedup)
  private[functions] val byId = new java.util.HashMap[Long, java.lang.Double]()

  def insert(score: Double, id: Long): Unit = {
    val existing = byId.get(id)
    if (existing != null) {
      if (score > existing.doubleValue()) {
        heap.remove(TopKBuffer.Cand(existing.doubleValue(), id)) // O(k), k small
        heap.add(TopKBuffer.Cand(score, id))
        byId.put(id, score)
      }
      return
    }
    if (byId.size < k) {
      heap.add(TopKBuffer.Cand(score, id))
      byId.put(id, score)
    } else {
      val worst = heap.peek()
      if (score > worst.score || (score == worst.score && id < worst.id)) {
        heap.poll()
        byId.remove(worst.id)
        heap.add(TopKBuffer.Cand(score, id))
        byId.put(id, score)
      }
    }
  }

  /** Entries best-first: (score desc, id asc). */
  def sorted: Array[TopKBuffer.Cand] = {
    val arr = heap.toArray(new Array[TopKBuffer.Cand](heap.size))
    java.util.Arrays.sort(arr, TopKBuffer.worstFirst.reversed())
    arr
  }
}

object TopKBuffer {
  final case class Cand(score: Double, id: Long)

  /** Total order with the worst candidate first (least element). */
  val worstFirst: java.util.Comparator[Cand] =
    new java.util.Comparator[Cand] {
      override def compare(a: Cand, b: Cand): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    }
}

/** top_k_by_score(score, id, k) → array<struct<score:double,id:bigint>>
  * sorted best-first. See [[TopKBuffer]].
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score expects (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  // TypedImperativeAggregate runs in ObjectHashAggregateExec outside
  // whole-stage codegen, so update() is the per-candidate hot path.
  // After the planner binds this function to its input schema the
  // children are plain BoundReferences; read them with primitive row
  // accessors instead of eval() (which allocates a boxed Double/Long
  // per row and dispatches through the interpreted-expression path).
  // Callers keep the fast path by projecting casts BEFORE the groupBy
  // (see Similarity.rankTopK).
  @transient private lazy val fastOrdinals: Option[(Int, Int)] =
    (scoreExpr, idExpr) match {
      case (s: org.apache.spark.sql.catalyst.expressions.BoundReference,
            i: org.apache.spark.sql.catalyst.expressions.BoundReference)
          if s.dataType == DoubleType && i.dataType == LongType =>
        Some((s.ordinal, i.ordinal))
      case _ => None
    }

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    fastOrdinals match {
      case Some((so, io)) =>
        if (!input.isNullAt(so) && !input.isNullAt(io)) {
          buffer.insert(input.getDouble(so), input.getLong(io))
        }
      case None =>
        val s = scoreExpr.eval(input)
        val id = idExpr.eval(input)
        if (s != null && id != null) {
          buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
        }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val c = it.next()
      buffer.insert(c.score, c.id)
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { c =>
      new GenericInternalRow(Array[Any](c.score, c.id))
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = buffer.sorted
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { c => bb.putDouble(c.score); bb.putLong(c.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKAgg {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def topKByScore(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k)
      .toAggregateExpression())
}

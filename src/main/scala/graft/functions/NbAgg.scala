package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.types._

/** Per-document Naive-Bayes scoring state: the token count plus one
  * running Σ n_db·w_b[l] per class, in scale-9 fixed point.
  */
final class NbBuffer(val nLabels: Int) {
  var nToks: Long = 0L
  val sums: Array[Long] = new Array[Long](nLabels)
}

/** nb_score(bucket) → struct<n_toks:bigint, pred_idx:int,
  * score:decimal(28,9)> — multinomial-NB inference over hashed
  * unigrams as ONE bounded aggregate.
  *
  * The natural relational spelling (join the token buckets to a
  * broadcast weight table, re-aggregate per (doc, class), join class
  * stats, rank with a window) reads the corpus TWICE: the per-class
  * partial sums and the per-doc token totals are two consumers of the
  * same (doc, bucket) aggregation, their parent operators differ, and
  * ReuseExchange cannot merge them — measured as two full
  * tokenize+explode scans per action. Folding the whole posterior
  * into one TypedImperativeAggregate makes inference a single
  * doc-keyed pass: tokenize → map-side partial buffers → one shuffle
  * of `partitions × docs` fixed-size buffers. That is the fastText-
  * gate shape a 100 TB filter run needs.
  *
  * Exactness contract (hash-parity with the relational form and the
  * DuckDB oracle): the model's 9-dp DECIMAL grid is carried as
  * unscaled scale-9 longs, every accumulation is exact integer
  * arithmetic, and the posterior emits as DECIMAL(28,9) built from
  * the final unscaled value — bit-identical to the decimal algebra it
  * replaces. Headroom: |score| ≤ tokens·ln-max ≈ 2^55 nanos for any
  * realistic document; the exact-arithmetic intrinsics fail loudly on
  * the ~2e8-token pathology rather than silently wrapping.
  *
  * Model layout: `bucketIds` sorted ascending with `flatW` holding
  * one dense per-class row per bucket (unseen (class, bucket) pairs
  * are exactly 0 — ln(0+1) — so density loses nothing); `priors` /
  * `lnorms` are indexed by the class's position in the CALLER-SORTED
  * label order, which also serves as the argmax tie-break.
  */
case class NbScore(
    bucketExpr: Expression,
    bucketIds: Array[Int],
    flatW: Array[Long],
    priors: Array[Long],
    lnorms: Array[Long],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NbBuffer] {

  private def nLabels: Int = priors.length
  require(lnorms.length == nLabels, "priors/lnorms length mismatch")
  require(flatW.length == bucketIds.length * nLabels, "flatW shape mismatch")

  override def children: Seq[Expression] = Seq(bucketExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("pred_idx", IntegerType, nullable = false),
    StructField("score", DecimalType(28, 9), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    bucketExpr.dataType match {
      case IntegerType => TypeCheckResult.TypeCheckSuccess
      case o => TypeCheckResult.TypeCheckFailure(
        s"nb_score expects an int bucket, got $o")
    }

  override def createAggregationBuffer(): NbBuffer = new NbBuffer(nLabels)

  @transient private lazy val fastOrdinal: Option[Int] = bucketExpr match {
    case b: BoundReference if b.dataType == IntegerType => Some(b.ordinal)
    case _ => None
  }

  // addExact/multiplyExact throughout: a pathological document (~2e8+
  // tokens against large-corpus weights) could overflow the scale-9
  // fixed point — the DECIMAL algebra this replaces cannot — and a
  // silent wrap would pick an arbitrary argmax. Fail loudly instead;
  // the intrinsics cost nothing on the non-overflowing path.
  private def add(buffer: NbBuffer, bucket: Int): Unit = {
    buffer.nToks += 1L
    val pos = java.util.Arrays.binarySearch(bucketIds, bucket)
    if (pos >= 0) {
      val base = pos * nLabels
      var l = 0
      while (l < nLabels) {
        buffer.sums(l) = Math.addExact(buffer.sums(l), flatW(base + l))
        l += 1
      }
    }
  }

  override def update(buffer: NbBuffer, input: InternalRow): NbBuffer = {
    fastOrdinal match {
      case Some(o) =>
        if (!input.isNullAt(o)) add(buffer, input.getInt(o))
      case None =>
        val b = bucketExpr.eval(input)
        if (b != null) add(buffer, b.asInstanceOf[Int])
    }
    buffer
  }

  override def merge(buffer: NbBuffer, other: NbBuffer): NbBuffer = {
    buffer.nToks += other.nToks
    var l = 0
    while (l < nLabels) {
      buffer.sums(l) = Math.addExact(buffer.sums(l), other.sums(l))
      l += 1
    }
    buffer
  }

  override def eval(buffer: NbBuffer): Any = {
    // score_l = prior_l + Σ n_db·w_b[l] − n_d·lnorm_l, all exact nanos;
    // argmax with ties to the smallest label index (= label sort order)
    var best = 0
    var bestScore = Long.MinValue
    var l = 0
    while (l < nLabels) {
      val s = Math.subtractExact(
        Math.addExact(priors(l), buffer.sums(l)),
        Math.multiplyExact(buffer.nToks, lnorms(l)))
      if (s > bestScore) { bestScore = s; best = l }
      l += 1
    }
    new GenericInternalRow(Array[Any](buffer.nToks, best,
      Decimal(BigDecimal(java.math.BigDecimal.valueOf(bestScore, 9)), 28, 9)))
  }

  override def serialize(buffer: NbBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.sums.length * 8)
    bb.putLong(buffer.nToks)
    buffer.sums.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): NbBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new NbBuffer(nLabels)
    buf.nToks = bb.getLong
    var l = 0
    while (l < nLabels) { buf.sums(l) = bb.getLong; l += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NbScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NbScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NbScore =
    copy(bucketExpr = newChildren(0))

  override def prettyName: String = "nb_score"
}

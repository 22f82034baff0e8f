package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al. 2011). A trained
  * codebook — per subspace m, the surviving k-means centroids ordered
  * by cell id — is baked into the expressions as a literal (it is
  * metadata: M × ksub × subDim doubles), so both encode and scoring
  * run as single-pass map-side kernels over the corpus: no explode, no
  * join, no shuffle of corpus rows anywhere in the serving path.
  *
  * All distance math mirrors the DuckDB oracle exactly: every dot
  * product is a sequential double fold (list_dot_product order), and
  * the squared L2 comparison is the literal expression
  * `dot(s,s) + dot(c,c) - 2·dot(s,c)` with ties resolved toward the
  * smaller cell id.
  */
final case class PqCodebook(subDim: Int,
                            cells: Array[Array[(Int, Array[Double])]]) {
  val numSub: Int = cells.length
  /** Flattened-LUT slot offsets per subspace. */
  val offsets: Array[Int] = cells.scanLeft(0)(_ + _.length).init
  val lutWidth: Int = offsets.lastOption.getOrElse(0) +
    cells.lastOption.map(_.length).getOrElse(0)
  /** Pre-folded dot(c, c) per (m, slot) — same sequential fold as the
    * per-row side, so the cached value is bit-identical to folding in
    * the row loop.
    */
  val selfDots: Array[Array[Double]] = cells.map(_.map { case (_, c) =>
    var d = 0.0; var i = 0
    while (i < c.length) { d += c(i) * c(i); i += 1 }
    d
  })
}

private[functions] object PqEval {
  /** dot of v[off, off+n) against c[0, n) — sequential fold. */
  def dotAt(v: ArrayData, et: DataType, off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      d += VecEval.toD(v, off + i, et) * c(i)
      i += 1
    }
    d
  }

  def selfDotAt(v: ArrayData, et: DataType, off: Int, n: Int): Double = {
    var d = 0.0
    var i = 0
    while (i < n) {
      val x = VecEval.toD(v, off + i, et)
      d += x * x
      i += 1
    }
    d
  }
}

/** pq_encode(vec) → array<int>: per subspace, the SLOT index (into the
  * codebook's cell-id-ordered centroid list) of the L2-nearest
  * centroid. Iterating slots in ascending cell-id order with a strict
  * `<` keeps the first minimum — equivalent to ORDER BY dist, cell_id.
  */
case class PqEncodeExpr(child: Expression, codebook: PqCodebook)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VecEval.checkArray(child.dataType, "input")

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](codebook.numSub)
    var m = 0
    while (m < codebook.numSub) {
      val off = m * codebook.subDim
      val dss = PqEval.selfDotAt(v, et, off, codebook.subDim)
      val slots = codebook.cells(m)
      val dccs = codebook.selfDots(m)
      var best = Double.PositiveInfinity
      var bestSlot = 0
      var s = 0
      while (s < slots.length) {
        val d = dss + dccs(s) - 2.0 * PqEval.dotAt(v, et, off, slots(s)._2)
        if (d < best) { best = d; bestSlot = s }
        s += 1
      }
      out(m) = bestSlot
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** pq_lut(qvec) → array<double>: the query's asymmetric-distance
  * lookup table, flattened by the codebook's slot offsets —
  * lut[offsets(m) + slot] = dot(q_sub_m, centroid).
  */
case class PqLutExpr(child: Expression, codebook: PqCodebook)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VecEval.checkArray(child.dataType, "input")

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](codebook.lutWidth)
    var m = 0
    while (m < codebook.numSub) {
      val off = m * codebook.subDim
      val slots = codebook.cells(m)
      var s = 0
      while (s < slots.length) {
        out(codebook.offsets(m) + s) = PqEval.dotAt(v, et, off, slots(s)._2)
        s += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

/** pq_adc(codes, lut) → double: Σ_m lut[offsets(m) + codes(m)],
  * accumulated in subspace order (the oracle sums the parts the same
  * way).
  */
case class PqAdcExpr(left: Expression, right: Expression, offsets: Array[Int])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expected (array<int>, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any = {
    val cs = codes.asInstanceOf[ArrayData]
    val lt = lut.asInstanceOf[ArrayData]
    var acc = 0.0
    var m = 0
    val n = cs.numElements()
    while (m < n) {
      acc += lt.getDouble(offsets(m) + cs.getInt(m))
      m += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "pq_adc"
}

object PqKernels {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def encode(vec: Column, codebook: PqCodebook): Column =
    column(PqEncodeExpr(expression(vec), codebook))

  def lut(qvec: Column, codebook: PqCodebook): Column =
    column(PqLutExpr(expression(qvec), codebook))

  def adcScore(codes: Column, lut: Column, codebook: PqCodebook): Column =
    column(PqAdcExpr(expression(codes), expression(lut), codebook.offsets))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass vector kernels (see TextSketches for why per-row math
  * lives in custom Expressions rather than zip_with/aggregate lambdas:
  * interpreted HOF evaluation costs a boxed virtual call per element).
  * Accumulation is double-precision in array order — identical results
  * to the HOF formulation, at memory bandwidth.
  */
private[functions] object VecEval {
  def toD(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case o => throw new IllegalArgumentException(s"bad element type $o")
  }

  def checkArray(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<numeric>, got $o")
  }
}

/** cosine_sim(a, b) → double; 0.0 for zero-norm inputs. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecEval.checkArray(left.dataType, "left") match {
      case TypeCheckResult.TypeCheckSuccess =>
        VecEval.checkArray(right.dataType, "right")
      case f => f
    }

  @transient private lazy val lt =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rt =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = VecEval.toD(x, i, lt)
      val yv = VecEval.toD(y, i, rt)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val nn = math.sqrt(nx) * math.sqrt(ny)
    java.lang.Double.valueOf(if (nn == 0.0) 0.0 else dot / nn)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** dot_product(a, b) → double: sequential left fold in double
  * precision (the same accumulation order as DuckDB's
  * list_dot_product — bit-identical results, see OracleSql).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecEval.checkArray(left.dataType, "left") match {
      case TypeCheckResult.TypeCheckSuccess =>
        VecEval.checkArray(right.dataType, "right")
      case f => f
    }

  @transient private lazy val lt =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rt =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += VecEval.toD(x, i, lt) * VecEval.toD(y, i, rt)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** srp_bucket(v) → long: packed sign bits of v·h over fixed seeded
  * hyperplanes (signed random projection LSH).
  */
case class SrpBucket(child: Expression, numPlanes: Int, dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    VecEval.checkArray(child.dataType, "input")

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val planes: Array[Array[Double]] =
    VectorKernels.srpPlanes(numPlanes, dim, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += VecEval.toD(v, i, et) * plane(i); i += 1 }
      if (dot > 0.0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "srp_bucket"
}

object VectorKernels {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  /** The seeded SRP hyperplanes — single source of truth for the
    * SrpBucket kernel AND external exact re-implementations (the
    * DuckDB oracle inlines these as literals).
    */
  def srpPlanes(numPlanes: Int, dim: Int,
                seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSim(expression(a), expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def srpBucket(v: Column, numPlanes: Int, dim: Int,
                seed: Long = 42L): Column =
    column(SrpBucket(expression(v), numPlanes, dim, seed))
}

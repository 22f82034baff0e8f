package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** libm_ln(x) → natural log via `java.lang.Math.log`.
  *
  * Spark's built-in `log()` evaluates through `StrictMath.log`
  * (fdlibm), which differs from platform libm — and therefore from
  * DuckDB/NumPy/C++ engines — in the last ulp on ~2% of inputs
  * (measured 142/6002 on DSIR-shaped ratios in this environment).
  * `Math.log` intrinsifies to the platform's correctly-rounded
  * implementation and was verified bit-identical to DuckDB's `ln`
  * here. Operators whose oracle parity depends on cross-engine
  * bit-equality of logarithms (DSIR weights, BM25 idf) must use this
  * instead of `org.apache.spark.sql.functions.log`.
  */
case class LibmLogExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected double, got $o")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "libm_ln"
}

object MathKernels {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def libmLn(x: Column): Column = column(LibmLogExpr(expression(x)))
}

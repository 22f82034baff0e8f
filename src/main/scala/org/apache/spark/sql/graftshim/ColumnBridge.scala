package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified `Column` wraps a ColumnNode; the classic
  * Expression⇄Column converters are `private[sql]`. This shim lives in
  * an `org.apache.spark.sql` subpackage purely to re-export them to
  * graft's custom Catalyst expressions (the conventional pattern for
  * out-of-tree extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

package graft.validate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** Read-only enforcement at the plan level — the Spark-native, stronger
  * version of the reference's `duckdb.connect(..., read_only=True)`
  * (api-service/src/query_engine.py:108, SURVEY.md §4.2).
  *
  * `spark.sql` executes Commands EAGERLY, so the check must run on the
  * parsed (pre-execution) plan: parse first, walk for side-effecting
  * nodes, only then hand the text to the session for execution.
  */
object PlanGuard {
  final class WriteRejectedException(msg: String)
      extends IllegalArgumentException(msg)

  /** Parse without executing and reject any non-read-only statement. */
  def assertReadOnly(spark: SparkSession, sql: String): LogicalPlan = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val offender = plan.collectFirst {
      case c: Command => c.nodeName
      case i: InsertIntoStatement => i.nodeName
      case p: ParsedStatement => p.nodeName
    }
    offender.foreach(n => throw new WriteRejectedException(
      s"Read-only query engine: statement $n is not allowed"))
    plan
  }
}

package org.apache.spark.sql.jdbc

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCPartition, JDBCRelation}
import org.apache.spark.sql.types.StructType

/** Test-only access shim: `JDBCOptions` / `JDBCPartition` /
  * `JDBCRelation` are `private[sql]`, and JdbcDialectSpec pins the
  * EXACT SQL text Spark would send to SQL Server (the reference's real
  * source, etl-service/src/database.py:79-85) without a live server —
  * dialect resolution, literal rendering, partition WHERE clauses, and
  * the assembled scan query all happen driver-side before any
  * connection is opened, so they are pinnable offline.
  */
object GraftJdbcTestAccess {

  def options(url: String, table: String,
              extra: Map[String, String] = Map.empty): JDBCOptions =
    // JDBCOptions insists on resolving a driver class at construction;
    // no SQL Server driver ships in this environment (and none is
    // needed — everything pinned here is driver-side text generation),
    // so name the Derby driver explicitly to satisfy the lookup. The
    // DIALECT is still chosen from the URL alone.
    new JDBCOptions(url, table,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver") ++ extra)

  /** The incremental-scan watermark predicate `col > ts` as the V2
    * Predicate Spark's JDBC scan pushes down (FieldReference /
    * LiteralValue are private[sql], hence built here).
    */
  def watermarkPredicate(col: String, ts: java.sql.Timestamp): Predicate =
    new Predicate(">", Array(
      org.apache.spark.sql.connector.expressions.FieldReference(col),
      org.apache.spark.sql.connector.expressions.LiteralValue(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts),
        org.apache.spark.sql.types.TimestampType)))

  /** The WHERE clause of every partition Spark plans for a
    * bounded/partitioned read — the clause text `JDBCRDD` splices into
    * each executor's query.
    */
  def partitionWhereClauses(schema: StructType, timeZoneId: String,
                            opts: JDBCOptions): Seq[String] =
    JDBCRelation.columnPartition(schema,
      (a: String, b: String) => a.equalsIgnoreCase(b), timeZoneId, opts)
      .toSeq.map(_.asInstanceOf[JDBCPartition].whereClause)

  /** The full per-partition scan SQL, exactly as the executor-side
    * statement is built (dialect query builder + pushed predicates +
    * partition clause + optional limit).
    */
  def buildQuery(dialect: JdbcDialect, opts: JDBCOptions,
                 columns: Array[String], preds: Array[Predicate],
                 partWhere: String, limit: Int = 0): String = {
    var b = dialect.getJdbcSQLQueryBuilder(opts)
      .withColumns(columns)
      .withPredicates(preds, JDBCPartition(partWhere, 0))
    if (limit > 0) b = b.withLimit(limit)
    b.build().trim
  }
}

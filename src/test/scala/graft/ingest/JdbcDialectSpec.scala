package graft.ingest

import org.apache.spark.sql.jdbc.{GraftJdbcTestAccess => A, JdbcDialects}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SQL Server dialect pin (r11 verdict item 3): the reference's actual
  * extract source is SQL Server over ODBC (etl-service/src/database.py:
  * 79-85 — `WHERE updated_at > ?` with a DATETIME2 timestamp literal,
  * ordered incremental reads; :97-105 INFORMATION_SCHEMA.COLUMNS
  * introspection). JdbcSourceSpec gates behavior against live Derby;
  * this spec pins the EXACT SQL text Spark generates when the URL is
  * SQL Server's — dialect resolution, watermark-predicate pushdown
  * text, partition WHERE clauses, the schema probe, and the assembled
  * per-partition scan statement are all built driver-side before any
  * connection opens, so they are assertable offline. If a Spark
  * upgrade moves any of these strings, this spec is the tripwire that
  * the wire protocol against the reference's database changed.
  */
class JdbcDialectSpec extends AnyFunSuite {

  private val url = "jdbc:sqlserver://dbhost:1433;databaseName=analytics"
  private val dialect = JdbcDialects.get(url)

  test("a sqlserver:// URL resolves the MsSqlServer dialect") {
    assert(dialect.getClass.getName ==
      "org.apache.spark.sql.jdbc.MsSqlServerDialect")
  }

  test("watermark predicate pushes as a DATETIME2-compatible literal with strict >") {
    // database.py:79-85 relies on `updated_at > <ts>` comparing against
    // DATETIME2; the ODBC-canonical 'yyyy-MM-dd HH:mm:ss[.fff]' literal
    // is what SQL Server parses under any language setting
    val ts = java.sql.Timestamp.valueOf("2025-06-01 12:34:56.789")
    assert(dialect.compileValue(ts) == "'2025-06-01 12:34:56.789'")
    val pred = A.watermarkPredicate("updated_at", ts)
    assert(dialect.compileExpression(pred).contains(
      "\"updated_at\" > '2025-06-01 12:34:56.789'"))
    // whole seconds keep the .0 — still a valid DATETIME2 literal
    val tsWhole = java.sql.Timestamp.valueOf("2025-06-01 00:00:00")
    assert(dialect.compileValue(tsWhole) == "'2025-06-01 00:00:00.0'")
  }

  test("identifier quoting is QUOTED_IDENTIFIER-style double quotes") {
    assert(dialect.quoteIdentifier("updated_at") == "\"updated_at\"")
    // an injection-shaped name cannot escape the quoting
    assert(dialect.quoteIdentifier("a\"b") == "\"a\"\"b\"")
  }

  test("schema introspection is the zero-row probe, not a scan") {
    assert(dialect.getSchemaQuery("dbo.inventory") ==
      "SELECT * FROM dbo.inventory WHERE 1=0")
  }

  test("partitioned-read WHERE clauses: numeric stride + NULL bucket in partition 0") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("updated_at", TimestampType)))
    val clauses = A.partitionWhereClauses(schema, "UTC",
      A.options(url, "dbo.inventory", Map(
        "partitionColumn" -> "id", "numPartitions" -> "3",
        "lowerBound" -> "0", "upperBound" -> "3000")))
    assert(clauses == Seq(
      """"id" < 1000 or "id" is null""",
      """"id" >= 1000 AND "id" < 2000""",
      """"id" >= 2000"""))
  }

  test("partitioned-read WHERE clauses: timestamp bounds render as timestamp literals") {
    // JdbcSource.probeBounds feeds MIN/MAX back as strings; the clause
    // literals must be the same DATETIME2-parseable form as the
    // watermark predicate or a SQL Server partitioned read would break
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("updated_at", TimestampType)))
    val clauses = A.partitionWhereClauses(schema, "UTC",
      A.options(url, "dbo.inventory", Map(
        "partitionColumn" -> "updated_at", "numPartitions" -> "2",
        "lowerBound" -> "2024-01-01 00:00:00",
        "upperBound" -> "2024-01-03 00:00:00")))
    assert(clauses == Seq(
      """"updated_at" < '2024-01-02 00:00:00' or "updated_at" is null""",
      """"updated_at" >= '2024-01-02 00:00:00'"""))
  }

  test("the assembled per-partition scan statement (pushdown + partition clause)") {
    val ts = java.sql.Timestamp.valueOf("2025-06-01 12:34:56.789")
    val sql = A.buildQuery(dialect, A.options(url, "dbo.inventory"),
      Array("\"id\"", "\"updated_at\""),
      Array(A.watermarkPredicate("updated_at", ts)),
      "\"id\" >= 1000 AND \"id\" < 2000")
    assert(sql == "SELECT  \"id\",\"updated_at\" FROM dbo.inventory " +
      "WHERE ((\"updated_at\" > '2025-06-01 12:34:56.789')) " +
      "AND (\"id\" >= 1000 AND \"id\" < 2000)")
  }

  test("limit pushdown renders SQL Server TOP (n), not LIMIT") {
    val sql = A.buildQuery(dialect, A.options(url, "dbo.inventory"),
      Array("\"id\""), Array.empty, "1=1", limit = 10)
    assert(sql == "SELECT TOP (10) \"id\" FROM dbo.inventory WHERE 1=1")
  }
}

package graft.tools

import org.apache.spark.sql.jdbc.{GraftJdbcTestAccess => A, JdbcDialects}
import org.apache.spark.sql.types._

/** Dev probe: print the exact SQL text MsSqlServerDialect generates
  * (used once to author JdbcDialectSpec's pinned strings; kept for
  * re-measuring after a Spark upgrade).
  */
object JdbcDialectProbe {
  def main(args: Array[String]): Unit = {
    val url = "jdbc:sqlserver://dbhost:1433;databaseName=analytics"
    val d = JdbcDialects.get(url)
    println(s"dialect = ${d.getClass.getName}")
    println(s"quoteIdentifier(updated_at) = ${d.quoteIdentifier("updated_at")}")
    println(s"getSchemaQuery = ${d.getSchemaQuery("dbo.inventory")}")
    val ts = java.sql.Timestamp.valueOf("2025-06-01 12:34:56.789")
    println(s"compileValue(ts) = ${d.compileValue(ts)}")
    val pred = A.watermarkPredicate("updated_at", ts)
    println(s"compileExpression(wm) = ${d.compileExpression(pred)}")

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("updated_at", TimestampType)))
    val optsNum = A.options(url, "dbo.inventory", Map(
      "partitionColumn" -> "id", "numPartitions" -> "3",
      "lowerBound" -> "0", "upperBound" -> "3000"))
    println("numeric partition clauses:")
    A.partitionWhereClauses(schema, "UTC", optsNum).foreach(c => println(s"  [$c]"))

    val optsTs = A.options(url, "dbo.inventory", Map(
      "partitionColumn" -> "updated_at", "numPartitions" -> "2",
      "lowerBound" -> "2024-01-01 00:00:00", "upperBound" -> "2024-01-03 00:00:00"))
    println("timestamp partition clauses:")
    A.partitionWhereClauses(schema, "UTC", optsTs).foreach(c => println(s"  [$c]"))

    println("full scan query:")
    println("  [" + A.buildQuery(d, A.options(url, "dbo.inventory"),
      Array("\"id\"", "\"updated_at\""), Array(pred),
      "\"id\" >= 1000 AND \"id\" < 2000") + "]")
    println("full scan query with limit 10:")
    println("  [" + A.buildQuery(d, A.options(url, "dbo.inventory"),
      Array("\"id\""), Array.empty, "1=1", limit = 10) + "]")
  }
}

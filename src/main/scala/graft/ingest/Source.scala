package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Abstraction over the extract side (reference: SQL Server via ODBC,
  * etl-service/src/database.py). Kept abstract because the offline test
  * environment has no JDBC endpoint (SURVEY.md §7.4 risk 6): the parquet
  * implementation is shape-identical to a JDBC one, and the incremental
  * read contract (strict `updated_at > since`, database.py:79-85) is
  * defined here once.
  */
trait Source {
  def tableNames: Seq[String]
  def read(spark: SparkSession, table: String): DataFrame

  /** S2: changed rows since the watermark — strict `>` exactly like the
    * reference (rows sharing the max timestamp written later are skipped;
    * SURVEY.md §2.9 T3). The predicate is a plain Catalyst filter, so it
    * pushes down to the scan (parquet min/max skip or JDBC WHERE).
    *
    * Watermarks travel as strings (ISO timestamp text): Catalyst casts
    * the literal to the column's type (TIMESTAMP or TIMESTAMP_NTZ), so
    * the contract is agnostic to which one the source surfaces.
    */
  def readChangedSince(spark: SparkSession, table: String,
                       since: Option[String],
                       watermarkCol: String = "updated_at"): DataFrame = {
    val df = read(spark, table)
    if (!df.schema.fieldNames.contains(watermarkCol)) df
    else since match {
      case Some(ts) => df.filter(col(watermarkCol) > lit(ts).cast(
        df.schema(watermarkCol).dataType))
        .orderBy(col(watermarkCol)) // database.py:83 ORDER BY updated_at
      case None => df
    }
  }

  /** S3: scalar watermark probe (MAX(updated_at), database.py:57-63). */
  def maxWatermark(spark: SparkSession, table: String,
                   watermarkCol: String = "updated_at"): Option[String] = {
    val df = read(spark, table)
    if (!df.schema.fieldNames.contains(watermarkCol)) None
    else Option(df.agg(max(col(watermarkCol)).cast("string")).first()
      .getString(0))
  }
}

/** Directory-of-parquet source: `<dir>/<table>.parquet`. Reads through
  * Tables.load so TIMESTAMP(NANOS) columns get the same ns→us
  * normalization everywhere.
  */
final class ParquetSource(dir: String, tables: Seq[String]) extends Source {
  def tableNames: Seq[String] = tables
  def read(spark: SparkSession, table: String): DataFrame =
    graft.core.Tables.load(spark, dir, table)
}

/** CSV source: `<dir>/<table>.csv` with header + schema inference.
  * At scale, pass an explicit schema instead — inference scans twice.
  */
final class CsvSource(dir: String, tables: Seq[String],
                      delimiter: String = ",") extends Source {
  def tableNames: Seq[String] = tables
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("inferSchema", "true")
      .csv(s"$dir/$table.csv")
}

/** ORC source: `<dir>/<table>.orc` (columnar alternative, built-in). */
final class OrcSource(dir: String, tables: Seq[String]) extends Source {
  def tableNames: Seq[String] = tables
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.orc(s"$dir/$table.orc")
}

/** JSON-lines source: `<dir>/<table>.jsonl`. */
final class JsonSource(dir: String, tables: Seq[String]) extends Source {
  def tableNames: Seq[String] = tables
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.json(s"$dir/$table.jsonl")
}

/** JDBC source — shape parity with the reference's extract path (S1:
  * full scan, partitioned on the key column for executor parallelism —
  * connections open on executors, not the driver). Unused in the offline
  * environment; compiled to keep the contract honest.
  */
final class JdbcSource(url: String, tables: Seq[String],
                       props: java.util.Properties,
                       partitionCol: Option[String] = Some("id"),
                       numPartitions: Int = 8) extends Source {
  def tableNames: Seq[String] = tables
  def read(spark: SparkSession, table: String): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    val withPart = partitionCol match {
      case Some(c) => base
        .option("partitionColumn", c)
        .option("numPartitions", numPartitions)
        // lower/upperBound must be probed by callers before use
      case None => base
    }
    props.stringPropertyNames().forEach(k =>
      withPart.option(k, props.getProperty(k)))
    withPart.load()
  }
}

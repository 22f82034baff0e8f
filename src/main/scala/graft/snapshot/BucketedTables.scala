package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables for co-located joins.
  *
  * Parquet snapshot dirs can't carry bucket metadata (Spark only
  * understands bucketing through the catalog), so hot fact tables that
  * are repeatedly joined on the same key get a second, bucketed
  * materialization: `bucketBy(n, key) + sortBy(key)` managed tables.
  * Two tables bucketed the same way join with NO shuffle exchange on
  * either side — at 100 TB that converts every fact-fact join on the
  * bucket key from a full network shuffle into local merge joins.
  */
object BucketedTables {

  def write(df: DataFrame, tableName: String, bucketCol: String,
            numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  def drop(spark: SparkSession, tableName: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
}

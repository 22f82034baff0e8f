package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loader for the snapshot table set (TESTDATA.md: one parquet file per
  * table under an sf directory). Mirrors the reference's snapshot-read
  * path (api-service/src/query_engine.py:78-108): the serving layer sees
  * a directory of columnar tables registered by name. At cluster scale
  * each "file" is a partitioned parquet directory; `spark.read.parquet`
  * handles both transparently.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped under two physical types across testdata
    // vintages. Legacy: parquet TIMESTAMP(NANOS), which Spark has no
    // native type for — read the raw int64 and truncate to
    // microseconds, exactly what DuckDB's ns→us TIMESTAMP conversion
    // does, so the oracle sees identical values. Current: native
    // TIMESTAMP(MICROS) without a timezone, which Spark infers as
    // TIMESTAMP_NTZ — cast to TimestampType (UTC session, same
    // instant) so every downstream consumer (unix_micros arithmetic,
    // streaming watermarks, dumped gate parquet) sees one type
    // regardless of vintage.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every table as a temp view (reference: conn.register /
    * CTAS, etl-service/src/sync.py:81-87 → SHOW TABLES surface).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

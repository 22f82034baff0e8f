package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated query catalog: the driver contract (SparkEntry) and the
  * bench harness both read from here.
  */
object Catalog {
  def all: Seq[Q] =
    RelationalQueries.all ++ ExtraQueries.all ++
      TextQueries.all ++ VectorQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  def headline: Seq[Q] = all.filter(_.headline)

  /** Collapse the multi-line Scala string layout to single-line SQL. */
  private def normalize(sql: String): String =
    sql.replaceAll("\\s+", " ").trim
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.SparkSpec

/** Column-pruning plan hygiene for the catalog's scan-heavy families.
  *
  * At 100 TB the dominant byte cost of the documents table is `text`
  * (and of embeddings, `embedding`); an entry that never touches those
  * columns must not drag them through the scan — that is the
  * difference between reading ~2 % of the table and reading all of it
  * on a 1000-executor cluster. Catalyst prunes automatically for
  * declarative plans, so these asserts are cheap; their value is
  * catching a future refactor that inserts a pruning barrier (a UDF
  * over the whole row, an RDD hop, a cache() of the raw table) in
  * front of the scan without anyone noticing at test scale.
  */
class PruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** All parquet scans of the plan as (root path, read-schema fields). */
  private def scans(df: DataFrame): Seq[(String, Set[String])] =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec =>
        val root = s.relation.location.rootPaths.headOption
          .map(_.toString).getOrElse("")
        root -> s.requiredSchema.fieldNames.toSet
      case s: BatchScanExec =>
        s.scan.description() -> s.scan.readSchema().fieldNames.toSet
    }

  private def scanOf(df: DataFrame, table: String): Set[String] = {
    val hits = scans(df).filter(_._1.contains(s"$table.parquet"))
    assert(hits.nonEmpty, s"no parquet scan of $table in plan")
    // several scans of the same table (self-join shapes): the widest
    // one is the one that must still be pruned
    hits.map(_._2).maxBy(_.size)
  }

  private def entry(name: String): DataFrame = {
    val q = graft.queries.Catalog.all.find(_.name == name).get
    q.run(spark, sf)
  }

  test("d04 lang stats never reads documents.text") {
    val read = scanOf(entry("d04_lang_stats"), "documents")
    assert(read == Set("lang", "n_chars"),
      s"expected {lang, n_chars}, scan reads $read")
  }

  test("d05 fingerprint reads only (doc_id, text)") {
    val read = scanOf(entry("d05_fingerprint_md5"), "documents")
    assert(read == Set("doc_id", "text"), s"scan reads $read")
  }

  test("e03 label centroids never reads vec_id") {
    val read = scanOf(entry("e03_label_centroids"), "embeddings")
    assert(read == Set("label", "embedding"), s"scan reads $read")
  }

  test("q03 count(*) reads zero columns (footer-count shape)") {
    val read = scanOf(entry("q03_count"), "lineitem")
    assert(read.isEmpty, s"COUNT(*) scan drags columns: $read")
  }

  test("q02 projection prunes lineitem to the 5 referenced columns") {
    // 4 projected + l_linenumber (ordering key only): pruning must
    // keep the sort column but drop the other 11
    val read = scanOf(entry("q02_select_columns"), "lineitem")
    assert(read == Set("l_orderkey", "l_linenumber", "l_partkey",
      "l_quantity", "l_extendedprice"), s"scan reads $read")
  }
}

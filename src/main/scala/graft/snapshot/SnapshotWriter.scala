package graft.snapshot

import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.model.Manifest

/** Publishes one snapshot generation (reference sync cycle steps K1-K6,
  * etl-service/src/sync.py:58-157):
  *
  *  1. write every table as parquet under `history/<key>/<table>/`
  *  2. write the per-generation manifest
  *  3. swap `current/manifest.json` — the atomic publish (T6)
  *
  * Scale notes: each table write is a distributed parquet job; callers
  * control partitioning (e.g. `df.repartition(n, $"id")` or
  * `sortWithinPartitions($"updated_at")` for min/max-stat pruning on
  * the watermark column — the Spark analog of the reference's
  * `updated_at` index, SURVEY.md §1.5). Row counts ride on parquet
  * footer metadata, not a second full scan.
  */
final class SnapshotWriter(store: SnapshotStore) {

  /** @param partitionBy per-table hive-style partition columns: the
    *   snapshot directory gains `col=value/` subdirs and any query
    *   filtering on them prunes whole directories at planning time
    *   (PartitionFilters — the coarse-grained analog of the row-group
    *   stats the sortCol provides).
    */
  def publish(tables: Map[String, DataFrame],
              now: Instant = Instant.now(),
              sortCol: Option[String] = Some("updated_at"),
              metadata: Map[String, String] = Map.empty,
              partitionBy: Map[String, Seq[String]] = Map.empty): Manifest = {
    val key = SnapshotStore.keyFor(now)

    val counts = tables.map { case (name, df) =>
      val out = df.schema.fieldNames.find(sortCol.contains) match {
        case Some(c) => df.sortWithinPartitions(c)
        case None => df
      }
      val dir = store.tableDir(key, name).toString
      val w = out.write.mode("overwrite")
      partitionBy.get(name).filter(_.nonEmpty) match {
        case Some(cols) => w.partitionBy(cols: _*).parquet(dir)
        case None => w.parquet(dir)
      }
      // count from footer metadata (Spark's parquet count fast path)
      name -> store.spark.read.parquet(dir).count()
    }

    val manifest = Manifest(
      version = key,
      timestamp = now.toString, // ISO-8601, reference sync.py:151
      snapshotKey = s"history/$key",
      tables = counts,
      metadata = Map("engine" -> "seretlspark") ++ metadata)

    val json = Manifest.toJson(manifest)
    store.writeString(new org.apache.hadoop.fs.Path(
      store.genDir(key), "manifest.json"), json)
    store.writeString(store.currentManifestPath, json) // the publish
    manifest
  }
}

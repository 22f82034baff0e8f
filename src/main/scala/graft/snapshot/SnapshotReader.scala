package graft.snapshot

import java.time.{Duration, Instant}

import org.apache.spark.sql.DataFrame

import graft.model.Manifest

/** Serving-side snapshot resolution with the reference's freshness
  * contract (api-service/src/query_engine.py:78-115): a TTL-cached view
  * of `current/manifest.json`; when the TTL lapses the manifest is
  * re-read and, if the version moved, the temp views are re-registered
  * against the new generation's parquet dirs. No data download step —
  * executors read the (possibly remote) parquet directly.
  *
  * Also recreates the reference's built-in derived view
  * `v_inventory_summary` (etl-service/src/sync.py:105-114) whenever an
  * `inventory` table is present.
  */
final class SnapshotReader(store: SnapshotStore,
                           ttl: Duration = Duration.ofSeconds(120),
                           clock: () => Instant = () => Instant.now()) {

  @volatile private var loadedVersion: Option[String] = None
  @volatile private var loadedAt: Option[Instant] = None
  @volatile private var manifest: Option[Manifest] = None

  def currentManifest: Option[Manifest] = manifest

  def tableNames: Seq[String] =
    manifest.map(_.tables.keys.toSeq.sorted).getOrElse(Seq.empty)

  /** Re-resolve the manifest if the TTL has lapsed — or on EVERY call
    * while nothing is loaded yet (reference parity: `_get_connection`
    * always downloads when it has no open snapshot,
    * api-service/src/query_engine.py:98-108; only a loaded snapshot is
    * TTL-cached).
    *
    * Absent or unreadable pointer while a snapshot IS loaded: keep
    * serving the loaded generation. The publish pointer swap is
    * rename-based; on object stores (s3a rename = copy+delete) a
    * crashed publisher can leave `current/manifest.json` momentarily
    * absent, and that window must degrade to staleness, never to an
    * outage — the generation's data and manifest are always complete
    * before the pointer moves (SnapshotWriter orders them), so the
    * last-registered views stay valid. The next TTL lapse retries.
    */
  def refreshIfStale(): Boolean = synchronized {
    val now = clock()
    val stale = loadedVersion.isEmpty || loadedAt.forall(t =>
      Duration.between(t, now).compareTo(ttl) >= 0)
    if (!stale) return false
    loadedAt = Some(now)
    val read = try store.readCurrentManifest() catch {
      // torn/garbage pointer (a non-rename writer mid-overwrite):
      // while loaded, identical to absent; first load has nothing to
      // fall back to, so surface it
      case scala.util.control.NonFatal(_) if loadedVersion.nonEmpty =>
        None
    }
    read match {
      case Some(m) if !loadedVersion.contains(m.version) =>
        register(m); true
      case _ => false
    }
  }

  def table(name: String): DataFrame =
    store.spark.table(name)

  private def register(m: Manifest): Unit = {
    m.tables.keys.foreach { t =>
      store.spark.read
        .parquet(store.tableDir(m.version, t).toString)
        .createOrReplaceTempView(t)
    }
    if (m.tables.contains("inventory")) {
      store.spark.sql(
        """CREATE OR REPLACE TEMP VIEW v_inventory_summary AS
          |SELECT COUNT(*)        AS total_items,
          |       SUM(quantity)   AS total_quantity,
          |       AVG(price)      AS avg_price,
          |       MIN(updated_at) AS oldest_update,
          |       MAX(updated_at) AS latest_update
          |FROM inventory""".stripMargin)
    }
    loadedVersion = Some(m.version)
    manifest = Some(m)
  }
}

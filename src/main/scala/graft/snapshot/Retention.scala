package graft.snapshot

import graft.model.MalformedManifest

/** History retention / GC (reference: keep the newest 24 snapshots,
  * etl-service/src/sync.py:160 + s3_uploader.py:108-137). Generation
  * keys are zero-padded UTC timestamps, so lexicographic sort IS
  * chronological sort — no per-object LastModified listing required
  * (cheaper against object stores than the reference's approach).
  *
  * `publisherEpoch` is the same fencing token [[SnapshotWriter]] checks
  * at pointer-swap time: GC is the OTHER mutation a stale overlapping
  * publisher must not perform, because its notion of "old generations"
  * can include one its successor just published and pointed at.
  *
  * Sizing note: the keep window is also the safety margin for
  * TTL-stale readers. A [[SnapshotReader]] keeps serving its loaded
  * generation for up to `ttl` after the pointer moves (and longer while
  * degraded on refresh faults), so `keepCount × cycle interval` must
  * comfortably exceed the reader TTL or a prune could delete parquet a
  * long-running query is still scanning — the defaults (24 generations
  * at 60 s cycles vs a 120 s TTL) give a 12× margin.
  */
final class Retention(store: SnapshotStore, keepCount: Int = 24,
                      publisherEpoch: Long = 0L) {

  /** Deletes all but the newest `keepCount` generations; never deletes
    * the generation the current manifest points at. Returns deleted keys.
    *
    * Refuses to delete ANYTHING when (a) the current manifest carries a
    * higher publisher epoch — a newer deployment owns this root and the
    * stale instance cannot know which generation it serves next — or
    * (b) the pointer is torn (unparseable): with no way to identify the
    * served generation, the only safe GC is none (the next healthy
    * publish heals the pointer and the next prune proceeds). Skipping a
    * prune is always safe — retention is idempotent and re-runs every
    * cycle; deleting a served generation is an outage.
    */
  def prune(): Seq[String] = {
    val current =
      try store.readCurrentManifest()
      catch { case _: MalformedManifest => return Seq.empty }
    if (current.exists(_.publisherEpoch > publisherEpoch)) return Seq.empty
    val currentKey = current.map(_.version)
    val gens = store.listGenerations().sorted.reverse // newest first
    val doomed = gens.drop(keepCount).filterNot(currentKey.contains)
    doomed.foreach(k => store.fs.delete(store.genDir(k), true))
    // claim-marker hygiene: an epoch strictly below the SERVED
    // manifest's can never be claimed again (claimEpoch's floor
    // includes the published epoch), so its marker is dead weight —
    // one file per deployment boot accumulates without bound under a
    // crash-looping deployer. Markers AT or ABOVE the served epoch are
    // kept: they may belong to a claimed-but-not-yet-published
    // successor whose first publish is in flight.
    current.map(_.publisherEpoch).foreach { served =>
      val epochsDir = new org.apache.hadoop.fs.Path(
        store.rootPath, "epochs")
      if (store.fs.exists(epochsDir))
        store.fs.listStatus(epochsDir).toSeq
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong)
            .toOption.map(n => (s.getPath, n)))
          .filter(_._2 < served)
          .foreach { case (p, _) => store.fs.delete(p, false) }
    }
    doomed
  }
}

package graft.snapshot

/** History retention / GC (reference: keep the newest 24 snapshots,
  * etl-service/src/sync.py:160 + s3_uploader.py:108-137). Generation
  * keys are zero-padded UTC timestamps, so lexicographic sort IS
  * chronological sort — no per-object LastModified listing required
  * (cheaper against object stores than the reference's approach).
  */
final class Retention(store: SnapshotStore, keepCount: Int = 24) {

  /** Deletes all but the newest `keepCount` generations; never deletes
    * the generation the current manifest points at. Returns deleted keys.
    */
  def prune(): Seq[String] = {
    val gens = store.listGenerations().sorted.reverse // newest first
    val currentKey = store.readCurrentManifest().map(_.version)
    val doomed = gens.drop(keepCount).filterNot(currentKey.contains)
    doomed.foreach(k => store.fs.delete(store.genDir(k), true))
    doomed
  }
}

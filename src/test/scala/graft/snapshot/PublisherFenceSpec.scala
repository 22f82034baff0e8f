package graft.snapshot

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.ingest.{ParquetSource, SyncManager, SyncMode, WatermarkStore}

/** The single-publisher fence (r11 verdict item 1): the reference keeps
  * one publisher alive with APScheduler max_instances=1 inside ONE
  * process (etl-service/src/main.py:80-91); a multi-node deployment
  * loses that, and a rolling deploy routinely overlaps the old
  * publisher with its replacement. The publisher epoch in the manifest
  * is the fencing token: the writer refuses to swap and retention
  * refuses to prune once a higher epoch is visible, so a stale
  * publisher can neither regress the pointer nor GC the generation its
  * successor serves. Plus the crash-orphan story (item 2): a publisher
  * dying between the table writes and the pointer swap leaves an
  * unreferenced generation that is never served and eventually pruned.
  */
class PublisherFenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def t(s: String) = Instant.parse(s)

  /** Fresh source dir + store; source table `fitems`(id, updated_at, v). */
  private def freshEnv(): (String, SnapshotStore) = {
    val srcDir = Files.createTempDirectory("graft-fence-src").toString
    val snapDir = Files.createTempDirectory("graft-fence-snap").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, ts("2024-01-02 00:00:00"), 20.0),
      (3L, ts("2024-01-03 00:00:00"), 30.0))
      .toDF("id", "updated_at", "v")
      .write.mode("overwrite").parquet(s"$srcDir/fitems.parquet")
    (srcDir, new SnapshotStore(spark, snapDir))
  }

  private def manager(srcDir: String, store: SnapshotStore, epoch: Long,
                      keep: Int = 24) =
    new SyncManager(spark, new ParquetSource(srcDir, Seq("fitems")), store,
      keepCount = keep, mode = SyncMode.Merge, publisherEpoch = epoch)

  private def addDelta(srcDir: String, id: Long, when: String): Unit = {
    val next = spark.read.parquet(s"$srcDir/fitems.parquet")
      .unionByName(Seq((id, ts(when), id * 1.5))
        .toDF("id", "updated_at", "v"))
    val tmp = s"$srcDir/__next"
    next.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$srcDir/fitems.parquet"), true)
    assert(fs.rename(new Path(tmp), new Path(s"$srcDir/fitems.parquet")))
  }

  test("claimEpoch: fresh store → 1; outranks published; torn reads as pre-epoch") {
    val (srcDir, store) = freshEnv()
    assert(SyncManager.claimEpoch(store) == 1L)
    val r = manager(srcDir, store, epoch = 5L).runCycle(t("2024-02-01T00:00:00Z"))
    assert(r.success, r.error)
    assert(store.readCurrentManifest().get.publisherEpoch == 5L)
    assert(SyncManager.claimEpoch(store) == 6L)
    store.writeString(store.currentManifestPath, "{torn")
    assert(SyncManager.claimEpoch(store) == 1L) // about to heal it
  }

  test("deploy overlap: the stale publisher can neither regress the pointer nor consume the delta") {
    val (srcDir, store) = freshEnv()
    val oldMgr = manager(srcDir, store, epoch = SyncManager.claimEpoch(store))
    val r1 = oldMgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(r1.success, r1.error)

    // rolling deploy: the replacement boots, claims epoch 2, publishes
    val newMgr = manager(srcDir, store, epoch = SyncManager.claimEpoch(store))
    val r2 = newMgr.runCycle(t("2024-02-01T01:00:00Z"))
    assert(r2.success, r2.error)
    val served = store.readCurrentManifest().get
    assert(served.publisherEpoch == 2L)

    // the old instance is still ticking and a delta has arrived
    addDelta(srcDir, 100L, "2024-03-01 00:00:00")
    val wmBefore = new WatermarkStore(store).load()
    val rStale = oldMgr.runCycle(t("2024-02-01T02:00:00Z"))
    assert(!rStale.success, "a stale publisher's cycle must fail soft")
    assert(rStale.error.exists(e => e.contains("StalePublisher") &&
      e.contains("epoch")), s"error lacks the diagnosis: ${rStale.error}")
    // pointer did NOT regress; watermark held (T7: advance only after
    // a successful publish — the delta is not skipped)
    val after = store.readCurrentManifest().get
    assert(after.version == served.version && after.publisherEpoch == 2L,
      s"pointer moved: ${served.version} -> ${after.version}")
    assert(new WatermarkStore(store).load() == wmBefore,
      "a fenced-off publish advanced the watermark")
    // the stale attempt's generation exists as an unreferenced orphan
    // (written before the fence check fired) — never served
    val orphan = SnapshotStore.keyFor(t("2024-02-01T02:00:00Z"))
    assert(store.fs.exists(store.genDir(orphan)))

    // the live publisher consumes the delta exactly once
    val r3 = newMgr.runCycle(t("2024-02-01T03:00:00Z"))
    assert(r3.success, r3.error)
    assert(r3.changedCounts("fitems") == 1L,
      s"delta not consumed exactly once: ${r3.changedCounts}")
    val snap = spark.read.parquet(
      store.tableDir(r3.manifest.get.version, "fitems").toString)
    assert(snap.filter($"id" === 100L).count() == 1L)
  }

  test("a stale publisher's retention refuses to prune; the live one's prunes") {
    val (srcDir, store) = freshEnv()
    val writer = new SnapshotWriter(store, publisherEpoch = 2L)
    val df = spark.read.parquet(s"$srcDir/fitems.parquet")
    (0 until 5).foreach(i => writer.publish(Map("fitems" -> df),
      t(s"2024-02-01T0$i:00:00Z"), sortCol = Some("updated_at")))
    assert(store.listGenerations().size == 5)

    val stale = new Retention(store, keepCount = 2, publisherEpoch = 1L)
    assert(stale.prune().isEmpty,
      "a stale publisher pruned against a higher-epoch manifest")
    assert(store.listGenerations().size == 5, "stale prune deleted data")

    val live = new Retention(store, keepCount = 2, publisherEpoch = 2L)
    assert(live.prune().size == 3)
    assert(store.listGenerations().size == 2)
  }

  test("a torn pointer suspends GC entirely until the next publish heals it") {
    val (srcDir, store) = freshEnv()
    val writer = new SnapshotWriter(store, publisherEpoch = 1L)
    val df = spark.read.parquet(s"$srcDir/fitems.parquet")
    (0 until 4).foreach(i => writer.publish(Map("fitems" -> df),
      t(s"2024-02-01T0$i:00:00Z"), sortCol = Some("updated_at")))
    store.writeString(store.currentManifestPath, "{not json")
    val ret = new Retention(store, keepCount = 2, publisherEpoch = 1L)
    assert(ret.prune().isEmpty,
      "pruned while the served generation was unidentifiable")
    assert(store.listGenerations().size == 4)
    writer.publish(Map("fitems" -> df), t("2024-02-01T05:00:00Z"),
      sortCol = Some("updated_at")) // heals the pointer
    assert(ret.prune().nonEmpty)
    assert(store.listGenerations().size == 2)
  }

  test("crash between table writes and pointer swap: orphan is never served and eventually pruned") {
    val (srcDir, store0) = freshEnv()
    // a store that simulates the publisher dying at the swap: the
    // generation dir + its manifest are fully written, the pointer is not
    class CrashingStore extends SnapshotStore(spark, store0.root) {
      @volatile var crashNextSwap = false
      override def writeString(path: Path, content: String): Unit = {
        if (crashNextSwap && path == currentManifestPath) {
          crashNextSwap = false
          throw new java.io.IOException("simulated publisher death at swap")
        }
        super.writeString(path, content)
      }
    }
    val store = new CrashingStore
    val writer = new SnapshotWriter(store, publisherEpoch = 1L)
    val df = spark.read.parquet(s"$srcDir/fitems.parquet")
    writer.publish(Map("fitems" -> df), t("2024-02-01T00:00:00Z"),
      sortCol = Some("updated_at"))
    val servedKey = SnapshotStore.keyFor(t("2024-02-01T00:00:00Z"))

    store.crashNextSwap = true
    intercept[java.io.IOException] {
      writer.publish(Map("fitems" -> df), t("2024-02-01T01:00:00Z"),
        sortCol = Some("updated_at"))
    }
    val orphanKey = SnapshotStore.keyFor(t("2024-02-01T01:00:00Z"))
    assert(store.fs.exists(store.genDir(orphanKey)), "orphan gen missing")
    assert(store.readGenerationManifest(orphanKey).nonEmpty,
      "orphan gen manifest missing — the crash was after both writes")

    // (a) never served: the reader follows the pointer only
    assert(store.readCurrentManifest().get.version == servedKey)
    val reader = new SnapshotReader(store)
    reader.refreshIfStale()
    assert(reader.currentManifest.get.version == servedKey,
      "reader adopted an unreferenced orphan generation")

    // (b) eventually pruned: once keepCount newer generations exist the
    // orphan ages out like any generation — it is not the pointer
    // target, so nothing protects it (nothing should)
    (2 until 5).foreach(i => writer.publish(Map("fitems" -> df),
      t(s"2024-02-01T0$i:00:00Z"), sortCol = Some("updated_at")))
    val pruned = new Retention(store, keepCount = 2,
      publisherEpoch = 1L).prune()
    assert(pruned.contains(orphanKey), s"orphan not collected: $pruned")
    assert(!store.fs.exists(store.genDir(orphanKey)))
    // the served generation at prune time was protected throughout
    assert(store.fs.exists(
      store.genDir(store.readCurrentManifest().get.version)))
  }
}

package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.hadoop.fs.Path

import graft.SparkSpec
import graft.snapshot.SnapshotStore

/** Torn-state policy for the durable watermark file (round 13). The
  * file shares the publish pointer's threat model — tmp+rename writes,
  * foreign non-rename writers, partial store failures — but a GARBAGE
  * watermark is strictly worse than a lost one: the cycle either wedges
  * forever (load fails every tick and only a successful cycle rewrites
  * the file) or, where the garbage casts to NULL, the strict-`>` delta
  * predicate goes eternally false and every future row of that table is
  * silently skipped. The pinned policy mirrors the torn-pointer heal:
  * parse-shaped corruption heals to ABSENT (the next cycle degrades to
  * a full table read whose stats re-establish the watermark, and the
  * publish rewrites the file), per-entry garbage drops only that entry,
  * and IO errors propagate to the fail-soft catch (a store blip must
  * not trigger a 100 TB re-read).
  */
class WatermarkStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def t(s: String) = Instant.parse(s)

  private def freshEnv(): (String, SnapshotStore) = {
    val srcDir = Files.createTempDirectory("graft-wm-src").toString
    val snapDir = Files.createTempDirectory("graft-wm-snap").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, ts("2024-01-02 00:00:00"), 20.0),
      (3L, ts("2024-01-03 00:00:00"), 30.0))
      .toDF("id", "updated_at", "v")
      .write.mode("overwrite").parquet(s"$srcDir/witems.parquet")
    (srcDir, new SnapshotStore(spark, snapDir))
  }

  private def wmPath(store: SnapshotStore) =
    new Path(store.rootPath, "state/watermarks.json")

  test("save/load round-trips every format save can produce") {
    val (_, store) = freshEnv()
    val wm = new WatermarkStore(store)
    val state = Map(
      "plain" -> "2024-01-01 00:00:00",
      "micros" -> "2024-01-01 00:00:00.123456",
      "iso_t" -> "2024-01-01T00:00:00",
      "iso_z" -> "2024-01-01T00:00:00Z")
    wm.save(state)
    assert(wm.load() == state)
  }

  test("a torn watermark file heals to absent; the cycle degrades to a full read and rewrites it") {
    val (srcDir, store) = freshEnv()
    val mgr = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("witems")), store,
      mode = SyncMode.Merge)
    val r1 = mgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(r1.success, r1.error)
    val healthy = new WatermarkStore(store).load()
    assert(healthy("witems") == "2024-01-03 00:00:00", healthy)

    // a foreign non-rename writer tears the file mid-overwrite
    store.writeString(wmPath(store), """{"witems": "2024-01-0""")
    assert(new WatermarkStore(store).load().isEmpty,
      "torn watermark file did not heal to absent")

    // the next cycle is EXPENSIVE but CORRECT: with no watermark the
    // delta scan degrades to the full table (3 rows re-read, not 0),
    // rows stay unique after the merge, and the publish's stats
    // re-establish the watermark — the file is healed, no wedge
    val r2 = mgr.runCycle(t("2024-02-01T01:00:00Z"))
    assert(r2.success, r2.error)
    assert(r2.changedCounts("witems") == 3L,
      s"expected the full-read bootstrap, got ${r2.changedCounts}")
    assert(new WatermarkStore(store).load() == healthy,
      "the healing cycle did not rewrite the watermark file")
    val snap = spark.read.parquet(
      store.tableDir(r2.manifest.get.version, "witems").toString)
    assert(snap.count() == 3L && snap.select("id").distinct().count() == 3L)

    // and the cycle after that is cheap again (strict > on the healed wm)
    val r3 = mgr.runCycle(t("2024-02-01T02:00:00Z"))
    assert(r3.success && r3.changedCounts("witems") == 0L, s"$r3")
  }

  test("valid-JSON garbage: non-object roots heal to absent; per-entry garbage drops only that entry") {
    val (_, store) = freshEnv()
    val wm = new WatermarkStore(store)
    Seq("[1, 2]", "\"a string\"", "42", "null").foreach { root =>
      store.writeString(wmPath(store), root)
      assert(wm.load().isEmpty, s"root $root did not heal to absent")
    }
    // a numeric value, an empty string, a non-timestamp string, and a
    // nested object are each garbage a NULL-casting predicate would
    // silently starve on — dropped; the healthy entry survives
    store.writeString(wmPath(store),
      """{"good": "2024-01-03 00:00:00", "num": 17,
        |"empty": "", "text": "not a timestamp",
        |"nested": {"x": 1}}""".stripMargin)
    assert(wm.load() == Map("good" -> "2024-01-03 00:00:00"))
    // an oversized blob heals to absent from file status alone —
    // never slurped into publisher memory
    store.writeString(wmPath(store), "x" * (17 * 1024 * 1024))
    assert(wm.load().isEmpty, "oversized state file did not heal")
  }

  test("an IO error propagates — a store blip must not trigger the full re-read") {
    val (srcDir, store0) = freshEnv()
    val store = new SnapshotStore(spark, store0.root) {
      override def readString(p: Path): Option[String] =
        if (p == wmPath(this))
          throw new java.io.IOException("simulated store blip")
        else super.readString(p)
    }
    intercept[java.io.IOException](new WatermarkStore(store).load())
    // end-to-end: the cycle fails SOFT (T7) without publishing under a
    // blank watermark state — pointer and store state untouched
    val mgr = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("witems")), store,
      mode = SyncMode.Merge)
    val r = mgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(!r.success && r.error.exists(_.contains("store blip")), s"$r")
    assert(store.readCurrentManifest().isEmpty,
      "a cycle that could not load its watermark state published anyway")
  }
}

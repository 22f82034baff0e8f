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
    // every supported watermark column type's cast-to-string shape:
    // TIMESTAMP (space-separated, optional fraction), ISO tolerance
    // forms, DATE, and numeric version counters / rowversion (round 14
    // — the timestamp-only load dropped the last two as "corruption",
    // permanently degrading those tables to full re-reads every cycle)
    val state = Map(
      "plain" -> "2024-01-01 00:00:00",
      "micros" -> "2024-01-01 00:00:00.123456",
      "iso_t" -> "2024-01-01T00:00:00",
      "iso_z" -> "2024-01-01T00:00:00Z",
      "date_col" -> "2024-01-01",
      "int_col" -> "12345",
      "neg_col" -> "-7",
      "dec_col" -> "123.450000",
      // FLOAT/DOUBLE casts (round 15): Java Double.toString shapes —
      // scientific notation past the plain-decimal range
      "dbl_col" -> "1.2345678E7",
      "dbl_small" -> "1.0E-4",
      "dbl_neg" -> "-3.5E10",
      "dbl_max" -> "1.7976931348623157E308")
    wm.save(state)
    assert(wm.load() == state)
  }

  test("a non-timestamp watermark column keeps its watermark across load — no eternal full re-reads") {
    // end-to-end regression for the round-14 advice: a DATE (or
    // numeric) watermark column's saved state must survive the next
    // cycle's load, so the delta scan stays incremental. Before the
    // fix, load() dropped the entry and EVERY subsequent cycle did a
    // full table read while warning about corruption that never
    // happened.
    import org.apache.spark.sql.functions.{col, to_date}
    val srcDir = Files.createTempDirectory("graft-wm-date-src").toString
    val snapDir = Files.createTempDirectory("graft-wm-date-snap").toString
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, ts("2024-01-02 00:00:00"), 20.0),
      (3L, ts("2024-01-03 00:00:00"), 30.0))
      .toDF("id", "updated_at", "v")
      .withColumn("updated_at", to_date(col("updated_at")))
      .write.mode("overwrite").parquet(s"$srcDir/ditems.parquet")
    val store = new SnapshotStore(spark, snapDir)
    val mgr = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("ditems")), store,
      mode = SyncMode.Merge)
    val r1 = mgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(r1.success, r1.error)
    assert(new WatermarkStore(store).load()("ditems") == "2024-01-03",
      "DATE watermark was not persisted in the date cast shape")
    // the second cycle must be CHEAP: strict > on the loaded DATE
    // watermark, zero changed rows — not a full-read bootstrap
    val r2 = mgr.runCycle(t("2024-02-01T01:00:00Z"))
    assert(r2.success && r2.changedCounts("ditems") == 0L,
      s"DATE watermark was dropped on load — the cycle degraded to a " +
        s"full re-read: $r2")
  }

  test("a DOUBLE watermark column round-trips in scientific notation; NaN is refused at save and never skips rows") {
    // r15 ADVICE: Spark's double→string cast emits Java Double.toString
    // shapes — "1.2345678E7" past the plain-decimal range — which the
    // bare NumericLiteral rejected, silently degrading a double
    // watermark to a full re-read every cycle. And the NON-finite casts
    // must never be persisted at all: a stored "NaN" casts back to NaN,
    // the strict-`>` delta predicate goes eternally false, and every
    // future row of the table is silently skipped — the worst failure
    // class this store knows. Pinned end-to-end on a real sync.
    val srcDir = Files.createTempDirectory("graft-wm-dbl-src").toString
    val snapDir = Files.createTempDirectory("graft-wm-dbl-snap").toString
    def seed(rows: Seq[(Long, Double, Double)]): Unit =
      rows.toDF("id", "updated_at", "v")
        .write.mode("overwrite").parquet(s"$srcDir/fitems.parquet")
    seed(Seq((1L, 1.0e7, 10.0), (2L, 1.2345678e7, 20.0)))
    val store = new SnapshotStore(spark, snapDir)
    val mgr = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("fitems")), store,
      mode = SyncMode.Merge)
    val r1 = mgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(r1.success, r1.error)
    assert(new WatermarkStore(store).load()("fitems") == "1.2345678E7",
      "double watermark not persisted in the Double.toString cast shape")
    // the loaded scientific-notation watermark keeps the cycle cheap
    val r2 = mgr.runCycle(t("2024-02-01T01:00:00Z"))
    assert(r2.success && r2.changedCounts("fitems") == 0L,
      s"scientific-notation watermark dropped on load — degraded to a" +
        s" full re-read: $r2")

    // a NaN lands in the watermark column: Spark's ordering makes it
    // the max (NaN is greatest), so the advance WOULD be "NaN"
    seed(Seq((1L, 1.0e7, 10.0), (2L, 1.2345678e7, 20.0),
      (3L, Double.NaN, 30.0)))
    val r3 = mgr.runCycle(t("2024-02-01T02:00:00Z"))
    assert(r3.success, r3.error)
    assert(r3.changedCounts("fitems") == 1L,
      s"the NaN row must be visible to the strict-> delta scan " +
        s"(NaN is greatest under Spark ordering): $r3")
    assert(new WatermarkStore(store).load()("fitems") == "1.2345678E7",
      "a NaN watermark was persisted — it would make strict-> " +
        "eternally false and silently skip every future row")
    // subsequent cycles RE-READ the NaN row (expensive + loud beats
    // silently skipped) and still refuse to advance onto it
    val r4 = mgr.runCycle(t("2024-02-01T03:00:00Z"))
    assert(r4.success && r4.changedCounts("fitems") == 1L,
      s"the NaN row was silently skipped: $r4")
    // the published snapshot carries it exactly once (MERGE on id)
    val snap = spark.read.parquet(
      store.tableDir(r4.manifest.get.version, "fitems").toString)
    assert(snap.count() == 3L && snap.filter($"id" === 3L).count() == 1L)
  }

  test("one store write per cycle: the batched advance replaces N per-table round-trips") {
    val srcDir = Files.createTempDirectory("graft-wm-batch-src").toString
    val snapDir = Files.createTempDirectory("graft-wm-batch-snap").toString
    Seq((1L, ts("2024-01-01 00:00:00"), 10.0),
        (2L, ts("2024-01-02 00:00:00"), 20.0))
      .toDF("id", "updated_at", "v")
      .write.mode("overwrite").parquet(s"$srcDir/wa.parquet")
    Seq((1L, ts("2024-01-05 00:00:00"), 1.0),
        (2L, ts("2024-01-06 00:00:00"), 2.0))
      .toDF("id", "updated_at", "v")
      .write.mode("overwrite").parquet(s"$srcDir/wb.parquet")
    val writes = new java.util.concurrent.atomic.AtomicInteger(0)
    val store = new SnapshotStore(spark, snapDir) {
      override def writeString(p: Path, content: String): Unit = {
        if (p == wmPath(this)) writes.incrementAndGet()
        super.writeString(p, content)
      }
    }
    val mgr = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("wa", "wb")), store,
      mode = SyncMode.Merge)
    val r1 = mgr.runCycle(t("2024-02-01T00:00:00Z"))
    assert(r1.success, r1.error)
    assert(writes.get() == 1,
      s"expected ONE watermark write for the 2-table cycle, got ${writes.get()}")
    assert(new WatermarkStore(store).load() == Map(
      "wa" -> "2024-01-02 00:00:00", "wb" -> "2024-01-06 00:00:00"))
    // an all-empty-delta cycle advances nothing → touches the file not
    // at all (an untouched file is one fewer torn-write window than a
    // rewritten identical one)
    val r2 = mgr.runCycle(t("2024-02-01T01:00:00Z"))
    assert(r2.success && r2.changedCounts.values.forall(_ == 0L), s"$r2")
    assert(writes.get() == 1,
      s"an empty-delta cycle rewrote the watermark file (${writes.get()} writes)")
  }

  test("property: every shape save can produce round-trips; shapes it cannot produce never do") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val (_, store) = freshEnv()
    val wm = new WatermarkStore(store)
    val pad2 = (n: Int) => f"$n%02d"
    // the string-cast images of the supported watermark column types
    val tsG = for {
      y <- Gen.choose(1970, 2100); mo <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
      mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
      frac <- Gen.oneOf("", ".1", ".123", ".123456")
    } yield s"$y-${pad2(mo)}-${pad2(d)} ${pad2(h)}:${pad2(mi)}:${pad2(s)}$frac"
    val dateG = for {
      y <- Gen.choose(1970, 2100); mo <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield s"$y-${pad2(mo)}-${pad2(d)}"
    val numG = for {
      neg <- Gen.oneOf("", "-")
      digits <- Gen.choose(1, 38)
      ds <- Gen.listOfN(digits, Gen.numChar).map(_.mkString)
      frac <- Gen.oneOf(Gen.const(""), Gen.listOfN(6, Gen.numChar)
        .map("." + _.mkString))
    } yield s"$neg$ds$frac"
    // finite FLOAT/DOUBLE casts (round 15): the literal Double.toString
    // image, exactly what max(col).cast("string") yields for a double
    // watermark column
    val dblG = Gen.chooseNum(-1.0e300, 1.0e300)
      .suchThat(d => !d.isNaN && !d.isInfinite).map(_.toString)
    val goodG = Gen.oneOf(tsG, dateG, numG, dblG)
    val stateG = Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), goodG))
    val roundTrips = Prop.forAll(stateG) { state =>
      wm.save(state); wm.load() == state
    }
    // shapes save cannot produce: any letter anywhere, a 39+-digit
    // blob, empty — must drop (never silently feed the strict-> cast)
    val badG = Gen.oneOf(
      Gen.identifier.suchThat(s => s.exists(_.isLetter)),
      Gen.listOfN(45, Gen.numChar).map(_.mkString),
      Gen.const(""))
    val drops = Prop.forAll(badG) { bad =>
      wm.save(Map.empty)
      store.writeString(
        new Path(store.rootPath, "state/watermarks.json"),
        s"""{"t": ${new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(bad)}}""")
      wm.load().isEmpty
    }
    Seq(roundTrips, drops).foreach { p =>
      val r = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(120), p)
      assert(r.passed, r.status.toString)
    }
  }

  test("garbage shapes no supported column type can produce still drop") {
    val (_, store) = freshEnv()
    val wm = new WatermarkStore(store)
    store.writeString(wmPath(store),
      """{"good_num": "12345", "good_date": "2024-01-01",
        |"blob": "9999999999999999999999999999999999999999999",
        |"notanum": "12a45", "baddate": "2024-13-99",
        |"empty": "", "text": "not a timestamp"}""".stripMargin)
    assert(wm.load() == Map(
      "good_num" -> "12345", "good_date" -> "2024-01-01"),
      "a garbage shape round-tripped (or a legitimate one was dropped)")
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

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Stage the real sf0.001 events into a streaming-source directory. */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed agg over the stream == batch groupBy of same data") {
    val stream = EventStream.readEvents(spark, eventsDir)
    // Complete mode so windows still inside the watermark at end-of-
    // stream are emitted too (append withholds unfinalized windows)
    EventStream.runToMemory(
      EventStream.windowedAgg(stream, "1 hour"), "win_out",
      OutputMode.Complete())
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
      .collect().map(_.toString)

    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
      .collect().map(_.toString)

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq,
      s"stream/batch divergence: ${streamed.length} vs ${batch.length} rows")
  }

  test("glob naming a Spark-written DIRECTORY streams its part files") {
    // Two physical layouts ship for the same logical table: the driver
    // testdata's single FILE `<sf>/events.parquet` and the Spark-written
    // DIRECTORY `<sf>/events.parquet/part-*` (ScaleUp, production
    // writers). pathGlobFilter matches leaf FILE names, so the directory
    // layout read 0 rows silently until readEvents special-cased it —
    // this pins both layouts to the same non-empty result.
    val base = Files.createTempDirectory("graft-layout").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.limit(500).repartition(3)
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val streamed = EventStream.readEvents(spark, base,
      glob = Some("events.parquet"))
    EventStream.runToMemory(
      streamed.groupBy().count(), "layout_out", OutputMode.Complete())
    val n = spark.table("layout_out").collect()(0).getLong(0)
    assert(n == 500, s"directory layout streamed $n of 500 rows")
  }

  test("empty-dir vintage sniff fails fast; explicit vintage overrides") {
    // Nothing to sniff → a wrong guess would surface later as an opaque
    // parquet-conversion error on the first batch; readEvents refuses
    // instead, naming the escape hatch in the message.
    val empty = Files.createTempDirectory("graft-empty").toString
    val ex = intercept[IllegalStateException] {
      EventStream.readEvents(spark, empty)
    }
    assert(ex.getMessage.contains(EventStream.VintageOption),
      s"diagnosis must name the override option: ${ex.getMessage}")

    // bogus override value → named rejection, not a silent default
    intercept[IllegalArgumentException] {
      EventStream.readEvents(spark, empty,
        options = Map(EventStream.VintageOption -> "iso8601"))
    }

    // explicit vintage lets the stream start before the producer writes;
    // files arriving later (matching the declared vintage) then stream
    val declared = EventStream.readEvents(spark, empty,
      options = Map(EventStream.VintageOption -> "micros"))
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(100).write.mode("append").parquet(empty)
    EventStream.runToMemory(
      declared.groupBy().count(), "empty_dir_out", OutputMode.Complete())
    assert(spark.table("empty_dir_out").collect()(0).getLong(0) == 100)
  }

  test("ts vintage matrix: ns-int64, µs-NTZ, µs-tz all stream identically") {
    // the driver's testdata has shipped events.ts as int64
    // TIMESTAMP(NANOS) and as native TIMESTAMP(MICROS) without tz
    // across rounds — readEvents sniffs the footer, so every physical
    // vintage must produce the same streamed result
    val base = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(500).cache()
    def staged(write: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Seq[String] = {
      val dir = Files.createTempDirectory("graft-vintage").toString
      write(base).write.mode("overwrite").parquet(dir)
      EventStream.runToMemory(
        EventStream.windowedAgg(EventStream.readEvents(spark, dir), "1 hour"),
        s"vintage_out_${dir.hashCode.abs}", OutputMode.Complete())
      spark.table(s"vintage_out_${dir.hashCode.abs}")
        .select("window_start", "event_type", "n")
        .orderBy("window_start", "event_type").collect().map(_.toString).toSeq
    }
    val ns = staged(_.withColumn("ts", expr("unix_micros(ts) * 1000")))
    val ntz = staged(_.withColumn("ts", col("ts").cast("timestamp_ntz")))
    val tz = staged(identity)
    assert(ns.nonEmpty && ns == ntz && ntz == tz,
      s"vintage divergence: ns=${ns.length} ntz=${ntz.length} tz=${tz.length}")
    base.unpersist()
  }

  test("session windows split on the gap") {
    val dir = Files.createTempDirectory("graft-sess").toString
    // user 1: two sessions (45-min gap); user 2: one session
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 00:10:00", 1L, "view", 2.0, "{}"),
      (3L, "2024-01-01 01:00:00", 1L, "view", 4.0, "{}"),
      (4L, "2024-01-01 00:05:00", 2L, "click", 8.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_timestamp(col("tss")) * 1000000000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    EventStream.runToMemory(
      EventStream.sessionAgg(EventStream.readEvents(spark, dir), "30 minutes"),
      "sess_out", OutputMode.Complete())
    val out = spark.table("sess_out")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3, out.mkString(";"))
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.head.getAs[Long]("n_events") == 2L) // 00:00+00:10 merged
    assert(u1(1).getAs[Long]("n_events") == 1L)   // 01:00 separate
  }

  test("streaming sync publishes snapshot generations per micro-batch") {
    import graft.snapshot.SnapshotStore
    val snapDir = Files.createTempDirectory("graft-ssnap").toString
    val ckpt = Files.createTempDirectory("graft-sckpt").toString
    val store = new SnapshotStore(spark, snapDir)
    val q = EventStream.streamToSnapshots(
      EventStream.readEvents(spark, eventsDir), store, "events", ckpt)
    q.awaitTermination(120000)
    val m = store.readCurrentManifest()
    assert(m.nonEmpty, "no manifest published")
    assert(m.get.tables("events") > 0)
    val snap = spark.read.parquet(
      store.tableDir(m.get.version, "events").toString)
    assert(snap.count() == m.get.tables("events"))
  }

  test("snapshot sync: restart resumes; a crash-replayed batch publishes exactly once") {
    import graft.snapshot.{SnapshotStore, SnapshotWriter}
    val tmp = Files.createTempDirectory("graft-ssync").toString
    val stage = s"$tmp/stage"
    val ckpt = s"$tmp/ckpt"
    val store = new SnapshotStore(spark, s"$tmp/store")

    def stageFile(name: String, ids: Range): Unit = {
      val scratch = s"$tmp/scratch_$name"
      ids.map(i => (i.toLong, s"2024-01-01 0$i:00:00", i.toLong % 3, "view",
          i * 1.0, "{}"))
        .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
        .withColumn("ts", unix_timestamp(col("tss")) * 1000000000L)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(scratch)
      // the file source lists top-level FILES — promote the lone part
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(java.nio.file.Paths.get(stage))
      Files.move(part.toPath, java.nio.file.Paths.get(s"$stage/$name.parquet"))
    }

    def run(): Unit = EventStream.streamToSnapshots(
      EventStream.readEvents(spark, stage,
        options = Map("maxFilesPerTrigger" -> "1")),
      store, "events", ckpt).awaitTermination()

    def publishedIds(): Seq[Long] = store.listGenerations()
      .map(k => spark.read.parquet(store.tableDir(k, "events").toString))
      .reduce(_.unionAll(_)).select("event_id").as[Long].collect().sorted.toSeq

    // phase 1: two files → two micro-batches → two generations
    stageFile("a", 0 until 3)
    stageFile("b", 3 until 6)
    run()
    assert(store.listGenerations().size == 2, "one generation per batch")
    assert(publishedIds() == (0L until 6L))

    // phase 2 (stop + restart): the checkpoint resumes — only the new
    // file becomes a batch, already-synced files are not re-published
    stageFile("c", 6 until 9)
    run()
    assert(store.listGenerations().size == 3)
    assert(publishedIds() == (0L until 9L))

    // phase 3 (crash with checkpoint loss — the at-least-once worst
    // case): a fresh checkpoint re-delivers EVERY file as a new batch
    // with ids restarting at 0; the manifest guard must swallow all
    // of them, publishing nothing twice
    EventStream.streamToSnapshots(
      EventStream.readEvents(spark, stage,
        options = Map("maxFilesPerTrigger" -> "1")),
      store, "events", s"$tmp/ckpt_lost").awaitTermination()
    assert(store.listGenerations().size == 3,
      "replayed batches must not publish new generations")
    assert(publishedIds() == (0L until 9L), "exactly-once violated")

    // the seam driven directly (what a replay does inside foreachBatch)
    val again = EventStream.publishBatchOnce(store, new SnapshotWriter(store),
      "events", spark.read.parquet(s"$stage/a.parquet"), 0L)
    assert(!again, "isBatchPublished must skip an already-published id")
  }

  test("streaming dedup drops watermark-horizon duplicates") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    // duplicate event_ids arriving close together (within the horizon)
    Seq(
      (1L, "2024-01-01 08:00:00", 1L, "view", 1.0, "{}"),
      (1L, "2024-01-01 08:10:00", 1L, "view", 1.0, "{}"), // dup id
      (2L, "2024-01-01 08:20:00", 2L, "click", 2.0, "{}"),
      (2L, "2024-01-01 08:21:00", 2L, "click", 2.0, "{}"), // dup id
      (3L, "2024-01-01 09:00:00", 1L, "view", 3.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", (unix_timestamp(col("tss")) * 1000L * 1000L * 1000L))
      .drop("tss")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    EventStream.runToMemory(
      EventStream.dedupStream(
        EventStream.readEvents(spark, dir), Seq("event_id"), "1 hour"),
      "dedup_out")
    val ids = spark.table("dedup_out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"dedup kept: $ids")
  }

  test("replay guard sees batch ids buried under later publishes") {
    import graft.snapshot.{SnapshotStore, SnapshotWriter}
    val snapDir = Files.createTempDirectory("graft-replay").toString
    val store = new SnapshotStore(spark, snapDir)
    val writer = new SnapshotWriter(store)
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    writer.publish(Map("t" -> df), metadata = Map("batch_id" -> "7"))
    // a concurrent SyncManager-style publish lands on top: `current`
    // no longer carries batch 7
    writer.publish(Map("t" -> df), metadata = Map.empty)
    assert(!store.readCurrentManifest().get.metadata.contains("batch_id"))
    assert(EventStream.isBatchPublished(store, 7L),
      "replay guard must scan history, not just the current manifest")
    assert(!EventStream.isBatchPublished(store, 8L))
  }

  test("stream-stream interval join: views within the preceding hour") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    Seq(
      (1L, "2024-01-01 08:00:00", 1L, "view", 1.0, "{}"),     // too old
      (2L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}"),     // in window
      (3L, "2024-01-01 10:30:00", 1L, "purchase", 9.0, "{}"),
      (4L, "2024-01-01 10:15:00", 2L, "view", 1.0, "{}"))     // other user
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_timestamp(col("tss")) * 1000000000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val events = EventStream.readEvents(spark, dir)
    val joined = EventStream.intervalJoin(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "view"),
      "user_id", maxAge = "1 hour")
    EventStream.runToMemory(joined, "ssj_out")
    val out = spark.table("ssj_out")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((3L, 2L)), out) // only the in-window same-user view
  }

  test("left-outer interval join emits settled unmatched rows with nulls") {
    val dir = Files.createTempDirectory("graft-ssjo").toString
    Seq(
      (1L, "2024-01-01 08:00:00", 1L, "purchase", 9.0, "{}"), // unmatched
      (2L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}"),
      (3L, "2024-01-01 10:30:00", 1L, "purchase", 9.0, "{}"), // matched
      // a late sentinel far past 08:00 + maxAge + lateness, so the
      // watermark provably settles the unmatched purchase's eviction
      (5L, "2024-01-01 23:00:00", 9L, "view", 1.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", unix_timestamp(col("tss")) * 1000000000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)

    val events = EventStream.readEvents(spark, dir)
    val joined = EventStream.intervalJoin(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "view"),
      "user_id", maxAge = "1 hour", joinType = "leftOuter")
    EventStream.runToMemory(joined, "ssjo_out")
    val out = spark.table("ssjo_out")
      .select("l_event_id", "r_event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // the matched purchase emits its pair; the settled unmatched one
    // emits exactly one null-side row after watermark eviction
    assert(out == Set((3L, 2L), (1L, -1L)), out)
  }

  test("stateful user profiles accumulate across a batch") {
    import EventStream.UserEvent
    val events = Seq(
      UserEvent(7L, "view", 1.5), UserEvent(7L, "click", 2.5),
      UserEvent(8L, "view", 4.0)).toDS()
    // mapGroupsWithState also runs on batch Datasets — same semantics
    val out = EventStream.userProfiles(events).collect()
      .map(p => p.user_id -> p).toMap
    assert(out(7L).n_events == 2L && out(7L).total_value == 4.0)
    assert(out(8L).n_events == 1L && out(8L).last_type == "view")
  }

  test("deterministic user activity: order-independent, cents-exact") {
    import EventStream.{ProfiledEvent, UserActivity}
    // deliberately unsorted input; 0.1+0.2-style grid values
    val evs = Seq(
      ProfiledEvent(7L, 3L, 300L, "purchase", 0.10),
      ProfiledEvent(7L, 1L, 100L, "view", 0.20),
      ProfiledEvent(7L, 2L, 300L, "click", 0.30), // ts tie: id 3 wins
      ProfiledEvent(8L, 4L, 50L, "view", 4.25))
    def run(order: Seq[ProfiledEvent]): Map[Long, UserActivity] =
      EventStream.userActivity(order.toDS()).collect()
        .map(a => a.user_id -> a).toMap
    val a = run(evs)
    val b = run(evs.reverse)
    assert(a == b)
    assert(a(7L).n_events == 3L && a(7L).v == 0.60) // exact, no fp drift
    assert(a(7L).first_us == 100L && a(7L).last_us == 300L)
    assert(a(7L).last_type == "purchase") // (300, 3) beats (300, 2)
    assert(a(8L).last_type == "view" && a(8L).v == 4.25)
  }
}

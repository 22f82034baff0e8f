package graft.fuzz

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** Randomized-stream differential fuzzer for the streaming engine:
  * generates event streams with shuffled arrival order, duplicates,
  * and late rows (inside AND outside the watermark), replays them
  * through the EventStream operators batch-by-batch (one file = one
  * micro-batch, ordered by file mtime + maxFilesPerTrigger=1), and
  * compares against an independent batch-semantics oracle over the
  * SAME rows.
  *
  * Why this exists: two of this project's three scale bugs were
  * streaming/sampling *semantics* (zero-row directory streams; quota
  * floor boundaries) that 1950 batch-SQL fuzz statements could never
  * touch. The batch gate entries (t01–t08) pin ONE arrival order per
  * sf; this fuzzer pins that the incremental execution is
  * order-insensitive and that late-row admission follows the
  * documented watermark model.
  *
  * Determinism notes baked into the generator:
  *  - `value` is always a multiple of 0.25 (exactly representable):
  *    double sums of such values below 2^51 are exact, so order of
  *    accumulation cannot produce last-ulp drift between stream and
  *    oracle.
  *  - event times are whole seconds and watermark delays are whole
  *    seconds, so ms-truncation of the engine's watermark cannot
  *    flip an admission decision. Exact `ts == wm` ties DO occur;
  *    the oracles encode Spark's measured tie behavior (a raw-ts row
  *    AT the watermark is DROPPED by the dedup and join late filters
  *    — strict `ts > wm`, tools.DedupTieProbe/JoinTieProbe; a tied
  *    dedup-state expiry is dead, tools.DedupExpiryProbe; a
  *    window/session survives only while its end is strictly above
  *    the watermark) rather than avoiding ties, so a boundary flip in
  *    a future Spark would be caught, not masked. The strict raw-ts
  *    rule was DISCOVERED by the multi-file axis: at file-per-batch
  *    alignment no tested seed ever landed a tie on a visible branch,
  *    and the old `>=` model survived 153 scenarios unchallenged.
  *  - closer rows (negative ids, event_type "__closer") advance the
  *    watermark far past all data so every append-mode result is
  *    fully emitted before comparison; they are excluded from every
  *    comparison.
  */
object StreamFuzz {

  final case class Ev(eventId: Long, tsUs: Long, userId: Long,
                      eventType: String, value: Double, props: String)

  final case class Scenario(seed: Long, idx: Int, kind: String,
                            latenessSec: Long, batches: Vector[Vector[Ev]])

  private val EpochUs = 1700000000L * 1000000L // fixed base instant
  private val Types = Vector("view", "click", "purchase", "refund")

  /** One generated scenario. `kind` rotates through the operator
    * families; the event-time spread adapts so that only the
    * `windowed-late` kind produces beyond-watermark rows (the other
    * oracles assume no drops and the generator enforces it by keeping
    * the whole spread inside the lateness horizon).
    */
  def scenario(seed: Long, idx: Int): Scenario = {
    val kinds = Vector("windowed", "windowed-late", "dedup", "session",
      "interval-join", "activity", "sliding-late", "dedup-late",
      "session-late", "join-late", "outer-join-late")
    val kind = kinds(idx % kinds.size)
    val r = new Random(seed * 1000003L + idx)
    val n = 200 + r.nextInt(400)
    val nBatches = 3 + r.nextInt(3)
    val users = 5 + r.nextInt(25)
    val lateness = kind match {
      case "windowed-late" | "sliding-late" | "dedup-late" |
           "session-late" | "join-late" | "outer-join-late" =>
        600L // 10 min; spread exceeds it
      case _ => 7200L // 2h horizon over a <=30min spread: nothing drops
    }
    val spreadSec = kind match {
      case "windowed-late" | "sliding-late" | "dedup-late" |
           "session-late" | "join-late" | "outer-join-late" =>
        3 * 3600 // 3h: rows CAN be beyond-watermark
      case _ => 1800
    }
    val base = (0 until n).map { i =>
      Ev(i.toLong,
        EpochUs + (r.nextInt(spreadSec).toLong * 1000000L),
        r.nextInt(users).toLong,
        Types(r.nextInt(Types.size)),
        r.nextInt(400) / 4.0, // exact multiples of 0.25
        "{}")
    }.toVector
    // shuffled arrival: event-time order and arrival order are unrelated
    val arrival = r.shuffle(base)
    // full-row duplicates (same event_id, same everything) sprinkled in
    // LATER batches than the original — the dedup op must drop them,
    // every other oracle sees them as real repeated rows
    val withDups =
      if (kind == "dedup") {
        val dups = r.shuffle(arrival.take(n / 4)).take(n / 8)
        arrival ++ dups
      } else if (kind == "dedup-late") {
        // redeliveries carry a LATER event time (the at-least-once
        // ingest shape): same key, ts bumped by up to 2× the delay, so
        // a redelivery can find its original's state expired while
        // still being admitted — the RE-EMISSION path. Identical-ts
        // copies can never reach it (admitted ∧ expired is
        // contradictory for equal timestamps). Originals are sampled
        // from EARLY batches so redeliveries (batch n−2) and
        // double-redelivery chains (batch n−1) arrive strictly later —
        // the chain is the only shape that distinguishes whether a
        // DROPPED duplicate refreshes the stored expiry (the model
        // says no: expiry is fixed at emission, so a third copy after
        // the original's expiry re-emits even though the second copy
        // arrived in between).
        def bump(e: Ev): Ev = e.copy(tsUs = e.tsUs +
          (r.nextInt((2 * lateness).toInt).toLong * 1000000L))
        val earlyZone = math.max(1, nBatches - 2)
        val sampled = r.shuffle(arrival.zipWithIndex
          .filter(_._2 % nBatches < earlyZone).map(_._1)).take(n / 8)
        val dups = sampled.map(bump)
        val chains = dups.take(n / 32).map(bump)
        arrival ++ dups ++ chains
      } else arrival
    val nDups =
      if (kind == "dedup-late")
        math.min(n / 8, arrival.zipWithIndex
          .count(_._2 % nBatches < math.max(1, nBatches - 2)))
      else 0
    val batches = withDups.zipWithIndex
      .groupBy { case (_, i) =>
        if (kind == "dedup-late" && i >= arrival.size)
          // redeliveries in batch n−2, chain copies in batch n−1
          (if (i >= arrival.size + nDups) nBatches - 1
           else math.max(1, nBatches - 2))
        else if (kind == "dedup" && i >= arrival.size)
          // duplicates land strictly after their original's batch
          nBatches - 1
        else i % nBatches
      }
      .toVector.sortBy(_._1)
      .map(_._2.map(_._1))
    Scenario(seed, idx, kind, lateness, batches)
  }

  // ── staging: one parquet file per micro-batch, mtime-ordered ───────

  /** Writes each batch as a single parquet file with strictly
    * increasing mtimes (FileStreamSource orders its listing by
    * timestamp), plus two far-future closer batches that advance the
    * watermark across two more micro-batches so every append-mode
    * result settles.
    */
  /** `Files.list` drained AND closed (the javadoc requires closing the
    * backing DirectoryStream; a leaked handle per scenario adds up
    * across the 4-way-concurrent fuzz suites on a ulimit-bound box). */
  def listDir(p: Path): Vector[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  def stage(spark: SparkSession, sc: Scenario): Path = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-streamfuzz")
    val maxTs = sc.batches.flatten.map(_.tsUs).max
    // The outer-join kind needs closers that REACH both join sides
    // (the event-type filters precede withWatermark, so a "__closer"
    // row advances neither side's watermark and the left-outer null
    // rows would never settle in a bounded replay): one far-future
    // purchase + view per closer batch, user −1, excluded from every
    // comparison.
    def closerRows(day: Int, idBase: Long): Vector[Ev] =
      if (sc.kind == "outer-join-late")
        Vector(
          Ev(idBase, maxTs + day.toLong * 86400000000L, -1L, "purchase", 0.0, "{}"),
          Ev(idBase - 1, maxTs + day.toLong * 86400000000L + 3600000000L,
            -1L, "view", 0.0, "{}"))
      else Vector(Ev(idBase, maxTs + day.toLong * 86400000000L, -1L,
        "__closer", 0.0, "{}"))
    val closers = Vector(closerRows(10, -1L), closerRows(20, -3L))
    (sc.batches ++ closers).zipWithIndex.foreach { case (batch, i) =>
      val tmp = Files.createTempDirectory("graft-streamfuzz-tmp")
      batch.toDF()
        .select(col("eventId").as("event_id"),
          expr("timestamp_micros(tsUs)").as("ts"),
          col("userId").as("user_id"),
          col("eventType").as("event_type"),
          col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = listDir(tmp).find(_.toString.endsWith(".parquet")).get
      val dest = dir.resolve(f"batch-$i%04d.parquet")
      Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        FileTime.fromMillis(1700000000000L + i * 60000L))
      org.apache.spark.network.util.JavaUtils.deleteRecursively(tmp.toFile)
    }
    dir
  }

  /** Replays `op(stream)` over the staged directory `filesPerTrigger`
    * files per micro-batch and returns the settled memory-sink table.
    */
  def replay(spark: SparkSession, dir: Path, name: String,
             op: DataFrame => DataFrame,
             mode: OutputMode = OutputMode.Append(),
             filesPerTrigger: Int = 1): DataFrame = {
    val events = EventStream.readEvents(spark, dir.toString,
      options = Map("maxFilesPerTrigger" -> filesPerTrigger.toString))
    EventStream.runToMemory(op(events), name, mode)
    spark.table(name)
  }

  /** The engine-batch view of a staged scenario under
    * maxFilesPerTrigger = k: FileStreamSource takes its mtime-ordered
    * listing k files at a time, so the oracle's batch structure is the
    * k-grouped one — multi-file micro-batches shift which watermark
    * governs each row (the lag-2 boundary lands on different rows than
    * the file-per-batch replay of the same scenario).
    *
    * Valid even though the two closer files are staged AFTER the data
    * files and can share the last data-bearing engine batch: under the
    * lag-2 model a closer in engine batch j first influences admission
    * and eviction in batch j+2, and every batch after j is pure
    * closers — so closers can never affect a DATA row's lifecycle, and
    * the oracles (which already exclude closer rows from comparison)
    * stay exact with plain data-batch grouping.
    */
  def grouped(sc: Scenario, k: Int): Scenario =
    if (k <= 1) sc
    else sc.copy(batches = sc.batches.grouped(k).map(_.flatten).toVector)

  def cleanup(dir: Path): Unit =
    try org.apache.spark.network.util.JavaUtils.deleteRecursively(dir.toFile)
    catch { case scala.util.control.NonFatal(_) => () }

  // ── checkpoint-restart replay ──────────────────────────────────────

  /** Replays `op` with a STOP/RESTART in the middle: the first
    * `splitAt` staged files stream through a query that is then
    * gracefully stopped mid-scenario; the remaining files (incl. the
    * closers) arrive and a NEW query resumes from the SAME checkpoint,
    * so every stateful operator must reload its live state (open
    * windows, dedup keys, buffered join rows, custom state) from the
    * state store. Output is collected through an idempotent
    * foreachBatch sink keyed by batchId — the memory sink refuses
    * append-mode recovery, and id-keyed upsert is exactly how a
    * production sink absorbs Spark's at-least-once seam.
    *
    * `crashReplay = true` additionally deletes the newest commit-log
    * entry between the runs (the crash-between-offset-write-and-commit
    * shape), forcing the restart to REPLAY that batch against the
    * state version from before it; the collector asserts the replayed
    * emission is multiset-identical to the original before
    * overwriting — the determinism that makes id-keyed sinks
    * exactly-once.
    */
  def replayRestart(session: SparkSession, sc: Scenario,
                    op: DataFrame => DataFrame, splitAt: Int,
                    crashReplay: Boolean = false,
                    mode: OutputMode = OutputMode.Append(),
                    restartWith: Option[SparkSession] = None,
                    filesPerTrigger: Int = 1): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(splitAt >= 1 && splitAt < sc.batches.size,
      s"splitAt=$splitAt outside [1, ${sc.batches.size})")
    val full = stage(session, sc)
    val live = Files.createTempDirectory("graft-streamfuzz-live")
    val ckpt = Files.createTempDirectory(EventStream.scratchBase,
      "graft-restart-ckpt-")
    try {
      val files = listDir(full).sortBy(_.getFileName.toString)
      val (pre, post) = files.splitAt(splitAt)
      def moveIn(fs: Vector[Path]): Unit = fs.foreach { f =>
        val mtime = Files.getLastModifiedTime(f)
        val dest = live.resolve(f.getFileName)
        Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest, mtime)
      }
      val buf = scala.collection.concurrent.TrieMap.empty[Long, Seq[Row]]
      @volatile var schema: org.apache.spark.sql.types.StructType = null
      @volatile var replayedBatches = 0
      val sinkFn: (Dataset[Row], Long) => Unit = { (b, id) =>
        val rows = b.collect().toSeq
        schema = b.schema
        buf.put(id, rows).foreach { prev =>
          // a replayed batch (crash shape) must re-emit EXACTLY the
          // rows of the original attempt: same offsets, same restored
          // watermark, state rolled back to the pre-batch version
          val a = prev.groupBy(identity).view.mapValues(_.size).toMap
          val c = rows.groupBy(identity).view.mapValues(_.size).toMap
          assert(a == c, s"replayed batch $id diverged from its " +
            s"original emission: ${a.size} distinct rows before, " +
            s"${c.size} after")
          replayedBatches += 1
        }
      }
      def runOnce(s: SparkSession): Unit = {
        val events = EventStream.readEvents(s, live.toString,
          options = Map("maxFilesPerTrigger" -> filesPerTrigger.toString))
        val q = op(events).writeStream.outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch(sinkFn)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      moveIn(pre)
      runOnce(session)
      if (crashReplay) {
        // drop the newest commit-log entry: offsets for that batch
        // exist but its commit doesn't — on restart the engine must
        // re-execute it (HDFSMetadataLog files are named by batch id;
        // the newest is usually the no-data batch the drain ran).
        // The checksum sidecar must go with it: Hadoop's local FS
        // renames the rewritten commit over the old name and refuses
        // when a dangling .N.crc remains (a real crash loses both).
        val commits = ckpt.resolve("commits")
        val entries = listDir(commits)
          .filter(_.getFileName.toString.matches("\\d+"))
        val newest = entries.maxBy(_.getFileName.toString.toLong)
        Files.delete(newest)
        Files.deleteIfExists(
          commits.resolve(s".${newest.getFileName}.crc"))
      }
      moveIn(post)
      // `restartWith` restarts under a DIFFERENT session (e.g. a
      // mismatched shuffle-partition conf): stateful confs are
      // restored from the checkpoint's offset metadata, and the spec
      // pins that the mismatch cannot re-shard state
      runOnce(restartWith.getOrElse(session))
      if (crashReplay)
        assert(replayedBatches >= 1,
          "crash shape staged but the restart replayed no batch")
      require(schema != null,
        "no batch was ever emitted — query produced no output")
      session.createDataFrame(buf.values.flatten.toSeq.asJava, schema)
    } finally {
      cleanup(full); cleanup(live); cleanup(ckpt)
    }
  }

  // ── the watermark model (shared by the late-aware oracles) ─────────

  /** Watermark GOVERNING admission during batch i (0-based): the value
    * computed from data seen through batch i-2 (max event time minus
    * delay, never decreasing; 0 before any data).
    *
    * Why i-2 and not i-1: Spark's MicroBatchExecution computes the
    * updated watermark from batch i-1's event-time stats and REPORTS it
    * in batch i's progress, but batch i's offsets/metadata were already
    * constructed with the previous value — the update only governs
    * filtering and eviction from batch i+1 on. Measured, not assumed:
    * replaying a 5-batch shuffled stream shows rows admitted in batch 1
    * for windows the batch-0-derived watermark had already passed
    * (StreamFuzzSpec's windowed-late scenarios pin this continuously).
    */
  def activeWatermarks(sc: Scenario): Vector[Long] = {
    val delayUs = sc.latenessSec * 1000000L
    val afterBatch = sc.batches.scanLeft(0L) { (wm, batch) =>
      math.max(wm, batch.map(_.tsUs).max - delayUs)
    } // afterBatch(j) = wm from data through batch j-1
    sc.batches.indices.toVector.map(i => if (i == 0) 0L else afterBatch(i - 1))
  }

  // ── oracles ────────────────────────────────────────────────────────

  /** Tumbling-window agg with the documented late-row model: a row in
    * batch i is admitted iff its window END is strictly above the
    * watermark active during batch i; the closers then emit every real
    * window. Returns (window_start_us, event_type) -> (n, v).
    */
  def windowedOracle(sc: Scenario, windowSec: Long = 3600L)
      : Map[(Long, String), (Long, Double)] = {
    val winUs = windowSec * 1000000L
    val wms = activeWatermarks(sc)
    val admitted = sc.batches.zipWithIndex.flatMap { case (batch, i) =>
      batch.filter { e =>
        val winEnd = (e.tsUs / winUs + 1L) * winUs
        winEnd > wms(i)
      }
    }
    admitted.groupBy(e => ((e.tsUs / winUs) * winUs, e.eventType))
      .map { case (k, evs) =>
        k -> (evs.size.toLong, evs.map(_.value).sum) }
  }

  /** Sliding windows (hour window, 20-min slide): each row maps to the
    * THREE windows covering its timestamp, and the late filter applies
    * per (row, window) PAIR — the window projection expands before the
    * stateful operator, so one physical row can be admitted into its
    * still-open windows while being dropped from the already-closed
    * ones in the same micro-batch. Same i−2 watermark model as
    * [[windowedOracle]]. Returns (window_start_us, event_type) -> (n, v).
    */
  def slidingOracle(sc: Scenario, windowSec: Long = 3600L,
                    slideSec: Long = 1200L)
      : Map[(Long, String), (Long, Double)] = {
    val winUs = windowSec * 1000000L
    val slideUs = slideSec * 1000000L
    val wms = activeWatermarks(sc)
    def windowsOf(tsUs: Long): Seq[Long] = {
      // starts of all windows [s, s+win) containing tsUs, slide-aligned
      val lastStart = (tsUs / slideUs) * slideUs
      Iterator.iterate(lastStart)(_ - slideUs)
        .takeWhile(s => s > lastStart - winUs).toSeq
    }
    val admitted = sc.batches.zipWithIndex.flatMap { case (batch, i) =>
      batch.flatMap { e =>
        windowsOf(e.tsUs).filter(_ + winUs > wms(i)).map(ws => (ws, e))
      }
    }
    admitted.groupBy { case (ws, e) => (ws, e.eventType) }
      .map { case (k, pairs) =>
        k -> (pairs.size.toLong, pairs.map(_._2.value).sum) }
  }

  /** Session windows (gap-merged) over all rows — valid because the
    * generator keeps non-late kinds inside the horizon (no drops).
    * Returns (user_id, session_start_us, session_end_us) -> (n, v).
    */
  def sessionOracle(sc: Scenario, gapSec: Long = 1800L)
      : Map[(Long, Long, Long), (Long, Double)] = {
    val gapUs = gapSec * 1000000L
    sc.batches.flatten.groupBy(_.userId).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(_.tsUs)
      val sessions = sorted.foldLeft(Vector.empty[Vector[Ev]]) { (acc, e) =>
        acc.lastOption match {
          case Some(cur) if e.tsUs < cur.last.tsUs + gapUs =>
            acc.init :+ (cur :+ e)
          case _ => acc :+ Vector(e)
        }
      }
      sessions.map { s =>
        (uid, s.head.tsUs, s.last.tsUs + gapUs) ->
          (s.size.toLong, s.map(_.value).sum)
      }
    }
  }

  /** Watermark dedup: duplicates are full-row copies arriving within
    * the horizon, so the settled output is exactly the distinct
    * event_id set.
    */
  def dedupOracle(sc: Scenario): Set[Long] =
    sc.batches.flatten.map(_.eventId).toSet

  /** Session windows over a stream with beyond-watermark rows: models
    * the session state lifecycle on the same i−2 watermark stream —
    *   1. batch i admits a row iff its own session interval's end
    *      (ts + gap) is strictly above the governing watermark;
    *   2. admitted rows merge into the user's LIVE sessions by
    *      interval overlap (a late-but-admitted row can extend a live
    *      session backwards);
    *   3. at the end of batch i, sessions whose end ≤ the same
    *      governing watermark are emitted and leave the state — so a
    *      later admitted row for that time range starts a NEW session:
    *      the output can contain two overlapping sessions for one
    *      user, which is exactly what downstream consumers of
    *      session_window output must tolerate under late data.
    * Returns (user_id, start_us, end_us) -> (n, v) with multiplicity
    * impossible (distinct (user,start,end) per emission by
    * construction of interval merging).
    */
  def sessionLateOracle(sc: Scenario, gapSec: Long = 1800L)
      : Map[(Long, Long, Long), (Long, Double)] = {
    val gapUs = gapSec * 1000000L
    val wms = activeWatermarks(sc)
    final case class Sess(startUs: Long, endUs: Long, n: Long, v: Double)
    val live = scala.collection.mutable.Map.empty[Long, Vector[Sess]]
    val out = scala.collection.mutable.Map
      .empty[(Long, Long, Long), (Long, Double)]
    def emit(uid: Long, s: Sess): Unit =
      out((uid, s.startUs, s.endUs)) = (s.n, s.v)
    sc.batches.zipWithIndex.foreach { case (batch, i) =>
      // eviction runs BEFORE the batch's rows are merged, with the same
      // lag-2 watermark the late filter uses — measured, not assumed:
      // evict-after-merge lets a same-batch late row resurrect a
      // session the engine provably emitted closed (the engine's
      // output then shows two overlapping sessions where that model
      // shows one merged), and an evict-with-fresher-wm model splits
      // pairs the engine provably merged. Same rule as the dedup state
      // lifecycle: expiry precedes matching, one watermark per batch.
      live.mapValuesInPlace { (uid, ss) =>
        val (done, keep) = ss.partition(_.endUs <= wms(i))
        done.foreach(emit(uid, _))
        keep
      }
      batch.filter(e => e.tsUs + gapUs > wms(i)).foreach { e =>
        val cur = live.getOrElse(e.userId, Vector.empty)
        val (overlap, rest) = cur.partition(s =>
          e.tsUs < s.endUs && e.tsUs + gapUs > s.startUs)
        val merged = overlap.foldLeft(
          Sess(e.tsUs, e.tsUs + gapUs, 1L, e.value)) { (a, s) =>
          Sess(math.min(a.startUs, s.startUs), math.max(a.endUs, s.endUs),
            a.n + s.n, a.v + s.v)
        }
        live(e.userId) = rest :+ merged
      }
    }
    live.foreach { case (uid, ss) => ss.foreach(emit(uid, _)) }
    out.toMap
  }

  /** Watermark dedup over a stream where rows AND their duplicates can
    * be late: models the full state lifecycle of
    * `dropDuplicatesWithinWatermark` —
    *   1. batch i admits a row iff its ts is STRICTLY above the
    *      governing watermark (same i−2 stream as the window oracles;
    *      a row AT the watermark is dropped — measured by
    *      tools.DedupTieProbe, and the same strict rule holds for the
    *      join late filter, tools.JoinTieProbe);
    *   2. expired keys (stored ts + delay <= wm — a TIED expiry is
    *      dead, measured by tools.DedupExpiryProbe, which also
    *      re-confirms expiry uses the lag-2 watermark, not the lag-1
    *      eviction value) are gone before the batch's rows are matched;
    *   3. an admitted row whose key is absent EMITS and stores its ts —
    *      so a duplicate arriving after its original's state expired
    *      RE-EMITS. That is the documented guarantee ("duplicates
    *      within the delay of each other are dropped", nothing more),
    *      and exactly what a 100 TB ingest must size the delay around.
    * Returns the emitted event_id MULTISET (re-emissions counted).
    */
  def dedupLateOracle(sc: Scenario): Seq[Long] = {
    val delayUs = sc.latenessSec * 1000000L
    val wms = activeWatermarks(sc)
    val state = scala.collection.mutable.Map.empty[Long, Long] // id -> ts
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    sc.batches.zipWithIndex.foreach { case (batch, i) =>
      val wm = wms(i)
      state.filterInPlace { case (_, ts) => ts + delayUs > wm }
      batch.foreach { e =>
        if (e.tsUs > wm && !state.contains(e.eventId)) {
          emitted += e.eventId
          state(e.eventId) = e.tsUs
        }
      }
    }
    emitted.sorted.toSeq
  }

  /** Dedup-late under MULTI-FILE micro-batches: the per-key emission
    * count is not always a function of the data. When a key's original
    * and a different-ts redelivery collide in ONE micro-batch (which
    * maxFilesPerTrigger>1 makes possible — the generator keeps them in
    * separate files), the engine emits one row but anchors the stored
    * expiry at whichever ADMITTED copy the shuffle fetch processed
    * first — an implementation accident of block fetch order, observed
    * both ways at the same seed. The documented guarantee ("duplicates
    * within the delay are dropped") is silent here, so the honest pin
    * is the reachable-state set: per key, every admitted same-batch
    * copy is a possible expiry anchor; dropped copies never refresh
    * (pinned at k=1); a later copy re-emits in exactly the branches
    * whose anchor expired. Returns key -> possible emission counts;
    * the engine's settled count must be a member for every key, and
    * keys never admitted must not appear. Reduces to the exact
    * [[dedupLateOracle]] multiset when no collision exists (every
    * count set is then a singleton).
    */
  def dedupLatePossibleCounts(sc: Scenario): Map[Long, Set[Int]] = {
    val delayUs = sc.latenessSec * 1000000L
    val wms = activeWatermarks(sc)
    // per key: reachable (emissions so far, live anchor ts) states
    val states = scala.collection.mutable.Map
      .empty[Long, Set[(Int, Option[Long])]]
    sc.batches.zipWithIndex.foreach { case (batch, i) =>
      val wm = wms(i)
      states.mapValuesInPlace { (_, ss) =>
        ss.map { case (n, ts) => (n, ts.filter(_ + delayUs > wm)) }
      }
      batch.filter(_.tsUs > wm).groupBy(_.eventId)
        .foreach { case (k, copies) =>
          val anchors = copies.map(_.tsUs).distinct
          states(k) = states.getOrElse(k, Set((0, Option.empty[Long])))
            .flatMap {
              case (n, None) => anchors.map(t => (n + 1, Some(t))).toSet
              case alive => Set(alive) // dropped copy: anchor unchanged
            }
        }
    }
    states.map { case (k, ss) => k -> ss.map(_._1) }.toMap
  }

  /** Interval join (views ⟕ preceding purchases by same user): batch
    * semantics over all rows — valid inside the horizon.
    * Returns the set of (user_id, l_event_id, r_event_id).
    */
  def intervalJoinOracle(sc: Scenario, maxAgeSec: Long = 1200L)
      : Set[(Long, Long, Long)] = {
    val maxAgeUs = maxAgeSec * 1000000L
    val all = sc.batches.flatten
    val left = all.filter(_.eventType == "purchase")
    val right = all.filter(_.eventType == "view")
    (for {
      l <- left
      r <- right
      if r.userId == l.userId && r.tsUs >= l.tsUs - maxAgeUs && r.tsUs <= l.tsUs
    } yield (l.userId, l.eventId, r.eventId)).toSet
  }

  /** Stream-stream interval join with beyond-watermark rows on BOTH
    * sides. Two measured facts make the oracle exact without modeling
    * buffer eviction at all:
    *  - each side's watermark advances from ITS OWN rows only (the
    *    event-type filter precedes withWatermark), and the query-level
    *    value that governs late-row admission is the MIN of the two,
    *    on the same lag-2 stream as every other operator;
    *  - Spark's join-state eviction bounds are derived from the join
    *    condition so that no pair of ADMITTED rows can lose its match
    *    (a buffered left with l_ts ≥ wm is exactly the left a future
    *    admitted right r_ts ≤ l_ts can still need, and symmetrically
    *    right rows down to wm − maxAge) — so the inner join's settled
    *    output is precisely "all condition-satisfying pairs whose two
    *    rows were each admitted at their own arrival batch".
    * Returns the set of (user_id, l_event_id, r_event_id).
    */
  /** The lag-2 MIN-of-sides governing watermark per batch for the
    * purchase⋈view join kinds: each side's watermark advances from
    * ITS OWN rows only (the event-type filter precedes
    * withWatermark); the query-level value is the min of the two.
    * ONE copy shared by both join oracles — the measured lag lives
    * here and nowhere else.
    */
  private def joinWms(sc: Scenario): Vector[Long] = {
    val delayUs = sc.latenessSec * 1000000L
    def sideWms(pred: Ev => Boolean): Vector[Long] = {
      val afterBatch = sc.batches.scanLeft(0L) { (wm, b) =>
        val ts = b.filter(pred).map(_.tsUs)
        if (ts.isEmpty) wm else math.max(wm, ts.max - delayUs)
      }
      sc.batches.indices.toVector.map(i =>
        if (i == 0) 0L else afterBatch(i - 1))
    }
    sideWms(_.eventType == "purchase")
      .zip(sideWms(_.eventType == "view")).map { case (a, b) => math.min(a, b) }
  }

  /** Rows of `eventType == t` admitted at their own arrival batch
    * under the join kinds' governing watermark (STRICT: a row AT the
    * watermark is dropped — tools.JoinTieProbe). */
  private def joinAdmitted(sc: Scenario, t: String): Vector[Ev] = {
    val wms = joinWms(sc)
    sc.batches.zipWithIndex.flatMap { case (b, i) =>
      b.filter(e => e.eventType == t && e.tsUs > wms(i)) }.toVector
  }

  def intervalJoinLateOracle(sc: Scenario, maxAgeSec: Long = 1200L)
      : Set[(Long, Long, Long)] = {
    val maxAgeUs = maxAgeSec * 1000000L
    val lefts = joinAdmitted(sc, "purchase")
    val rights = joinAdmitted(sc, "view")
    (for {
      l <- lefts
      rr <- rights
      if rr.userId == l.userId &&
        rr.tsUs >= l.tsUs - maxAgeUs && rr.tsUs <= l.tsUs
    } yield (l.userId, l.eventId, rr.eventId)).toSet
  }

  /** Left-outer interval join under late data: the match set is
    * exactly the inner oracle's (null-extension changes nothing about
    * which pairs join), and a null row settles for every ADMITTED left
    * with no admitted match — provided something advances both sides'
    * watermarks past the data, which the kind's typed closer rows do.
    * Returns (matches, settledNullLeftIds).
    */
  def outerJoinLateOracle(sc: Scenario, maxAgeSec: Long = 1200L)
      : (Set[(Long, Long, Long)], Set[Long]) = {
    val matches = intervalJoinLateOracle(sc, maxAgeSec)
    val admittedLeftIds = joinAdmitted(sc, "purchase").map(_.eventId).toSet
    val matchedLeftIds = matches.map(_._2)
    (matches, admittedLeftIds -- matchedLeftIds)
  }

  /** Final per-user activity state: every field is a pure function of
    * the event SET (the order-independence claim under test).
    * Returns user_id -> (n, v, first_us, last_us, last_type).
    */
  def activityOracle(sc: Scenario)
      : Map[Long, (Long, Double, Long, Long, String)] =
    sc.batches.flatten.groupBy(_.userId).map { case (uid, evs) =>
      val cents = evs.map(e => Math.round(e.value * 100.0)).sum
      val last = evs.maxBy(e => (e.tsUs, e.eventId))
      uid -> (evs.size.toLong, cents / 100.0,
        evs.map(_.tsUs).min, last.tsUs, last.eventType)
    }
}

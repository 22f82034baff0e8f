package graft.tools

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Proves the heaviest catalog entries degrade by SPILLING — not by
  * OOM, and not by changing their answer — when execution memory binds
  * (the #1 real failure mode at 100 TB, where per-executor memory is
  * the constraint the roomy sandbox never exercises).
  *
  * Three child JVMs over `localdata/sf1`:
  *  - ROOMY (12g, all 10 entries): reference digests, ~zero pressure;
  *  - TIGHT BATCH (512m, the 8 batch entries): must exit green — no
  *    OOM — with nonzero disk spill (proof the pressure was real) and
  *    every digest identical to the roomy run (spill changed the
  *    schedule, never the answer). 512m is ~4% of the r8 sweep's
  *    sandbox heap; the unified memory manager's sort/agg/join state
  *    goes to disk instead of dying.
  *  - TIGHT STREAMING (1g, t02/t08): green + digest-identical. These
  *    two hold ~700 MB of session/sync state that the default HDFS
  *    provider keeps ON HEAP by design — it cannot spill, so their
  *    past-heap regime is a state-backend switch, not a spill:
  *    measured separately in StateCrossoverSpec (HDFS OOMs past heap,
  *    RocksDB completes). 1g is the tightest heap that still fits the
  *    irreducible state.
  *
  * Cancels when `localdata/sf1` is absent (synthesized per-round by
  * tools.ScaleUp, not committed).
  */
class MemoryPressureSpec extends AnyFunSuite {

  private val sf1 = sys.env.getOrElse("GRAFT_SF1_DIR", "localdata/sf1")

  /** The heaviest batch entries by sf0.1 bench time / pair volume: the
    * dedup pair families (d08/d09/d18), the full curation and
    * decontamination pipelines (d12/d17/d32), repeated spans (d31),
    * and semantic dedup (e08).
    */
  private val batchEntries = Seq(
    "d08_minhash_neardups", "d09_simhash_neardups", "d12_curation",
    "d17_decontamination", "d18_neardup_clusters", "d31_repeated_spans",
    "d32_ngram_contamination", "e08_semantic_dedup")

  /** The two state-heaviest streaming entries (sessions, MERGE sync). */
  private val streamEntries = Seq(
    "t02_stream_sessions", "t08_stream_snapshot_sync")

  private case class Line(rows: Long, digest: BigInt, spillDisk: Long)

  private def runProbe(heap: String, entries: Seq[String])
      : (Int, String, Map[String, Line], Long) = {
    val (code, text) = ForkedJvm.run("graft.tools.MemoryPressureProbe",
      sf1 +: entries, heap)
    val entryRe =
      """\[memprobe\] (\S+) rows=(\d+) digest=(-?\d+) secs=\S+ spillMem=(\d+) spillDisk=(\d+) peakExec=(\d+)""".r
    val lines = entryRe.findAllMatchIn(text).map(m =>
      m.group(1) -> Line(m.group(2).toLong, BigInt(m.group(3)),
        m.group(5).toLong)).toMap
    val totalRe = """\[memprobe\] TOTAL spillMem=\d+ spillDisk=(\d+)""".r
    val totalDisk = totalRe.findFirstMatchIn(text).map(_.group(1).toLong)
      .getOrElse(-1L)
    (code, text, lines, totalDisk)
  }

  private def assertSameAnswers(roomy: Map[String, Line],
                                tight: Map[String, Line],
                                entries: Seq[String]): Unit =
    entries.foreach { e =>
      assert(tight(e).rows == roomy(e).rows &&
          tight(e).digest == roomy(e).digest,
        s"$e diverged under memory pressure: roomy=${roomy(e)} tight=${tight(e)}")
    }

  test("heaviest entries under a tight heap: spill, not OOM, same answer") {
    assume(Files.exists(Paths.get(s"$sf1/documents.parquet")),
      s"sf1 scale point not synthesized at $sf1")
    val all = batchEntries ++ streamEntries

    val (roomyCode, roomyOut, roomy, _) = runProbe("12g", all)
    assert(roomyCode == 0, s"roomy probe died:\n${roomyOut.takeRight(4000)}")
    assert(roomy.keySet == all.toSet,
      s"roomy probe missing entries: ${all.toSet -- roomy.keySet}")
    assert(roomy.values.forall(_.rows > 0), s"vacuous roomy run: $roomy")

    // the tight heaps are deliberately at the edge; under full-suite
    // parallelism (several other suites fork 3-4g JVMs concurrently)
    // scheduler contention can shift spill pacing enough to tip a run
    // over. One retry keeps that flake out of the gate — but ONLY for
    // an OOM-shaped first failure (the contention mode): any other
    // failure (wrong digest, probe crash, missing entry) is a real
    // defect and fails immediately, so the retry cannot launder it
    // (r11 ADVICE low). A GENUINE memory regression — deterministic
    // for a fixed heap — still fails both attempts.
    def runTight(heap: String, entries: Seq[String], what: String) = {
      val first = runProbe(heap, entries)
      if (first._1 == 0) first
      else {
        val oomShaped = Seq("OutOfMemoryError", "Java heap space",
          "GC overhead limit", "SparkOutOfMemory", "Direct buffer memory",
          "Killed").exists(first._2.contains)
        assert(oomShaped,
          s"$what probe at $heap failed NON-OOM-shaped (exit " +
            s"${first._1}) — not heap contention, not retryable:\n" +
            first._2.takeRight(4000))
        info(s"$what probe at $heap OOMed once (exit ${first._1}); " +
          "retrying — suite-parallel contention is the known benign cause")
        runProbe(heap, entries)
      }
    }
    val (tightCode, tightOut, tight, tightDisk) =
      runTight("512m", batchEntries, "tight batch")
    assert(tightCode == 0,
      s"tight-heap batch probe died twice (OOM, not spill):\n${tightOut.takeRight(4000)}")
    assert(tight.keySet == batchEntries.toSet,
      s"tight probe missing entries: ${batchEntries.toSet -- tight.keySet}")
    assert(tightDisk > 0,
      "tight batch run never spilled — the heap wasn't tight enough for " +
        s"the pressure claim to be non-vacuous:\n${tightOut.takeRight(2000)}")
    assertSameAnswers(roomy, tight, batchEntries)
    info(s"batch entries at 512m: total disk spill ${tightDisk / (1 << 20)} MiB")
    tight.toSeq.sortBy(-_._2.spillDisk).take(3).foreach { case (e, l) =>
      info(f"  $e spilled ${l.spillDisk / (1 << 20)} MiB to disk") }

    val (streamCode, streamOut, stream, _) =
      runTight("1g", streamEntries, "tight streaming")
    assert(streamCode == 0,
      "tight-heap streaming probe died twice — state no longer fits 1g; " +
        s"re-measure the crossover:\n${streamOut.takeRight(4000)}")
    assert(stream.keySet == streamEntries.toSet,
      s"stream probe missing entries: ${streamEntries.toSet -- stream.keySet}")
    assertSameAnswers(roomy, stream, streamEntries)
    info("streaming entries green at 1g (state-in-heap by design; the " +
      "past-heap regime is StateCrossoverSpec's RocksDB switch)")
  }
}

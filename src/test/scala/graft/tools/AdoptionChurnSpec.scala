package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Forked-JVM gate for the zero-width session swap's driver-side cost
  * (round 16, r15 verdict task 5): ~2,000 adoptions — each allocating
  * a fresh child SparkSession — with concurrent queries, under a heap
  * far too small for 2,000 pinned session states. Three invariants:
  *
  *  - LIVENESS: the probe exits green (a session/catalog leak at this
  *    scale OOMs a 640 MiB heap long before 2,000 adoptions);
  *  - STABILITY: used-after-GC heap at adoption 2,000 sits within
  *    200 MiB of the adoption-200 steady state — per-adoption driver
  *    growth is bounded by GC reclaim, not accumulation;
  *  - SERVING: every concurrent query saw one generation whole (zero
  *    mixed left/right reads — the zero-width property under churn,
  *    not just under the SnapshotSyncSpec hammer) and zero errors.
  */
class AdoptionChurnSpec extends AnyFunSuite {

  test("2,000 adoptions: stable driver heap, zero mixed-generation queries") {
    val (code, out) = ForkedJvm.run("graft.tools.AdoptionChurnProbe",
      Seq("2000"), "640m")
    assert(code == 0 && out.contains("CHURN_OK"),
      s"churn probe died (leak-shaped if OOM): exit=$code\n${out.takeRight(3000)}")
    val re = ("""\[churn\] adoptions=(\d+) swaps=(\d+) queries=(\d+) """ +
      """errors=(\d+) mixes=(\d+) heapWarm=(\d+) heapEnd=(\d+) heapMax=(\d+)""").r
    val m = re.findFirstMatchIn(out).getOrElse(
      fail(s"no [churn] line in probe output:\n${out.takeRight(2000)}"))
    val (adoptions, swaps, queries, errors, mixes) =
      (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong,
        m.group(4).toLong, m.group(5).toLong)
    val (heapWarm, heapEnd) = (m.group(6).toLong, m.group(7).toLong)
    assert(adoptions == 2000L)
    assert(swaps == adoptions,
      "every adoption must publish a NEW session (zero-width swap)")
    assert(queries > 0L, "concurrent query threads never ran — vacuous")
    assert(errors == 0L, s"$errors concurrent queries failed during churn")
    assert(mixes == 0L,
      s"$mixes queries saw a mixed-generation catalog under churn")
    val growth = heapEnd - heapWarm
    assert(growth < 200L * 1024 * 1024,
      s"driver heap grew ${growth / 1024 / 1024} MiB across 1,800 " +
        "adoptions — session states are being pinned, not GC'd")
  }
}

package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fuzz.StreamFuzz

/** Deterministic pins for the engine's watermark TIE rules — the facts
  * the round-10 multi-file fuzz axis discovered and the one-shot probes
  * (tools.DedupTieProbe / JoinTieProbe / DedupExpiryProbe) measured,
  * promoted to always-run tests so a Spark upgrade that moves any
  * boundary fails HERE with the rule named, not as a fuzz divergence
  * three layers up:
  *
  *  1. the dedup late filter is STRICT: a row with ts == wm drops;
  *  2. the stream-stream join late filter is STRICT the same way;
  *  3. a dedup state entry with ts + delay == wm is EXPIRED (alive
  *     only strictly above), and expiry keeps using the lag-2
  *     watermark, not the lag-1 eviction value.
  *
  * All scenarios use whole-second timestamps and the same lag-2
  * governing-watermark model the fuzz oracles pin continuously.
  */
class WatermarkTieSpec extends SparkSpec {
  import spark.implicits._

  private val us = 1000000L
  private def ev(id: Long, tsSec: Long, uid: Long = 0L,
                 tpe: String = "view") =
    StreamFuzz.Ev(id, tsSec * us, uid, tpe, 0.0, "{}")

  test("dedup late filter drops a row exactly AT the watermark") {
    // b2 governed (lag-2) by b0's wm: 1600 - 600 = 1000
    val sc = StreamFuzz.Scenario(0L, 0, "dedup-tie", 600L, Vector(
      Vector(ev(1, 1600)),
      Vector(ev(2, 1500)),
      Vector(ev(3, 1000), ev(4, 999), ev(5, 1001))))
    val dir = StreamFuzz.stage(spark, sc)
    try {
      val rows = StreamFuzz.replay(spark, dir, "wmtie_dedup", evs =>
          EventStream.dedupStream(evs, Seq("event_id"),
            lateness = "600 seconds"))
        .filter(col("event_id") >= 0)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(rows == Seq(1L, 2L, 5L),
        s"tie rule moved: emitted $rows — expected the ts==wm row (3) " +
          "and the behind row (4) dropped, the above row (5) kept")
    } finally StreamFuzz.cleanup(dir)
  }

  test("join late filter drops a row exactly AT the watermark") {
    val sc = StreamFuzz.Scenario(0L, 0, "join-tie", 600L, Vector(
      Vector(ev(1, 1600, 100L, "purchase"), ev(2, 1600, 100L, "view")),
      Vector(ev(3, 1500, 101L, "purchase"), ev(4, 1500, 101L, "view")),
      Vector(
        ev(10, 1000, 10L, "purchase"), ev(11, 1000, 10L, "view"), // tie
        ev(12, 1001, 11L, "purchase"), ev(13, 1001, 11L, "view"), // above
        ev(14, 999, 12L, "purchase"), ev(15, 999, 12L, "view")))) // behind
    val dir = StreamFuzz.stage(spark, sc)
    try {
      val users = StreamFuzz.replay(spark, dir, "wmtie_join", evs =>
          EventStream.intervalJoin(
            evs.filter(col("event_type") === "purchase"),
            evs.filter(col("event_type") === "view"),
            "user_id", maxAge = "20 minutes", lateness = "600 seconds"))
        .select("user_id").as[Long].collect().toSet
      assert(users == Set(100L, 101L, 11L),
        s"join tie rule moved: joined users $users — expected the " +
          "ts==wm pair (10) and the behind pair (12) dropped, " +
          "the above pair (11) kept")
    } finally StreamFuzz.cleanup(dir)
  }

  test("dedup state with expiry exactly AT the watermark is dead; expiry stays lag-2") {
    // k6: expiry 1600 == b3's governing wm -> its redelivery re-emits.
    // k7: expiry 1500; at b2 the lag-2 wm is 1000 (alive -> redelivery
    // drops); a lag-1 eviction at end of b1 (wm 1600) would have purged
    // it and re-emitted.
    val sc = StreamFuzz.Scenario(0L, 0, "dedup-expiry", 600L, Vector(
      Vector(ev(1, 1600), ev(6, 1000), ev(7, 900)),
      Vector(ev(2, 2200)),
      Vector(ev(7, 1601)),
      Vector(ev(6, 2300))))
    val dir = StreamFuzz.stage(spark, sc)
    try {
      val rows = StreamFuzz.replay(spark, dir, "wmtie_expiry", evs =>
          EventStream.dedupStream(evs, Seq("event_id"),
            lateness = "600 seconds"))
        .filter(col("event_id") >= 0)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(rows == Seq(1L, 2L, 6L, 6L, 7L),
        s"expiry rule moved: emitted $rows — expected k6 re-emitted " +
          "(tied expiry dead) and k7 single (lag-2 expiry, still alive)")
    } finally StreamFuzz.cleanup(dir)
  }
}

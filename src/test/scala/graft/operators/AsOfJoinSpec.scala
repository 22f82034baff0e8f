package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: most recent right row at or before left time") {
    val trades = Seq(
      (1L, 100L, ts("2024-01-01 10:00:05")),
      (2L, 100L, ts("2024-01-01 10:00:10")),
      (3L, 200L, ts("2024-01-01 10:00:01")),
      (4L, 100L, ts("2024-01-01 09:00:00"))) // before any quote
      .toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      (100L, ts("2024-01-01 10:00:00"), 10.0),
      (100L, ts("2024-01-01 10:00:07"), 11.0),
      (100L, ts("2024-01-01 10:00:10"), 12.0), // equal-ts → inclusive
      (200L, ts("2024-01-01 09:59:00"), 5.0))
      .toDF("sym", "q_ts", "price")

    val out = AsOfJoin.backward(trades, quotes, "sym", "t_ts", "q_ts",
      Map("price" -> "last_price"))
      .orderBy("trade_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(r.fieldIndex("last_price"))))
    assert(out.toSeq == Seq(
      1L -> Some(10.0),   // 10:00:05 → quote at 10:00:00
      2L -> Some(12.0),   // equal timestamp matches (<=)
      3L -> Some(5.0),
      4L -> None))        // no earlier quote
  }

  test("tolerance nulls out stale matches") {
    val l = Seq((1L, 7L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "lt")
    val r = Seq((7L, ts("2024-01-01 10:00:00"), "old")).toDF("k", "rt", "v")
    val strict = AsOfJoin.backward(l, r, "k", "lt", "rt",
      Map("v" -> "matched"), tolerance = Some(3600L)).first()
    assert(strict.isNullAt(strict.fieldIndex("matched"))) // 2h old > 1h tol
    val loose = AsOfJoin.backward(l, r, "k", "lt", "rt",
      Map("v" -> "matched"), tolerance = Some(3 * 3600L)).first()
    assert(loose.getString(loose.fieldIndex("matched")) == "old")
  }

  test("salted join equals plain join on skewed data") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toLong))
      .toDF("k", "payload") // key 1 is hot
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "label")
    val plain = big.join(small, "k").orderBy("payload")
      .collect().map(_.toString).toSeq
    val salted = SkewJoin.saltedJoin(big, small, "k", 8, "payload")
      .select("k", "payload", "label").orderBy("payload")
      .collect().map(_.toString).toSeq
    assert(salted == plain)
    assert(salted.count(_.contains("hot")) == 201) // 200 multiples of 10 + i=1
  }
}

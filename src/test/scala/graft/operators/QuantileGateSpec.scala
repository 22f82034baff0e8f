package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class QuantileGateSpec extends SparkSpec {
  import spark.implicits._

  // group a: scores 1..4 (p50 = 2.5); group b: scores 10,20 (p50 = 15)
  private lazy val df = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
    ("b", 5L, 10.0), ("b", 6L, 20.0)
  ).toDF("g", "id", "score")

  test("keeps rows at or above the per-group quantile") {
    val kept = QuantileGate.keepAbove(df, "g", "score", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L, 6L))
  }

  test("quantile 0 keeps everything; approx mode agrees here") {
    assert(QuantileGate.keepAbove(df, "g", "score", 0.0).count() == 6L)
    val approx = QuantileGate
      .keepAbove(df, "g", "score", 0.5, exact = false)
      .select("id").as[Long].collect().sorted.toSeq
    // t-digest at this size returns an actual value (2.0 or 3.0), so
    // the kept set contains at least the exact-gate survivors
    assert(approx.contains(4L) && approx.contains(6L))
  }

  test("the threshold frame broadcasts; the corpus is not shuffled for the join") {
    val plan = QuantileGate.keepAbove(df, "g", "score", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join of the |groups|-row threshold frame:\n$plan")
  }

  test("ties on the threshold value are kept (>= semantics)") {
    val t = Seq(("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0))
      .toDF("g", "id", "score")
    assert(QuantileGate.keepAbove(t, "g", "score", 0.5).count() == 3L)
  }

  test("gating column values survive untouched") {
    val out = QuantileGate.keepAbove(df, "g", "score", 0.5)
    assert(out.columns.toSeq == Seq("g", "id", "score"))
    assert(out.filter(col("g") === "b").count() == 1L)
  }
}

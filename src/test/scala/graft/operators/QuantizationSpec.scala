package graft.operators

import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // near query 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
    (4L, Array(0.0f, 0.0f, 0.0f)))   // zero vector
    .toDF("vec_id", "embedding")

  test("codes are clamped int8 with the absmax element at ±127") {
    val all = Quantization.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, Seq[Int], Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(all(0L)._1 == Seq(127, 0, 0))
    assert(all(3L)._1 == Seq(-127, 0, 0))
    assert(all(1L)._1.max == 127, s"absmax element must code to 127: ${all(1L)}")
    assert(all.values.forall(_._1.forall(c => c >= -127 && c <= 127)))
  }

  test("zero vectors quantize to zero codes with scale 0") {
    val z = Quantization.quantizeInt8(vecs, "vec_id", "embedding")
      .filter($"vec_id" === 4L).as[(Long, Seq[Int], Double)].head()
    assert(z._2 == Seq(0, 0, 0) && z._3 == 0.0)
  }

  test("int8 top-k preserves the exact ranking on well-separated vectors") {
    val out = Quantization.topKInt8(vecs.filter($"vec_id" === 0L), vecs,
      "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(_._3).toSeq
    assert(out.map(_._2) == Seq(1L, 2L, 4L) || out.map(_._2).head == 1L,
      s"nearest must be the near-duplicate: $out")
    val exact = Similarity.bruteTopK(vecs.filter($"vec_id" === 0L), vecs,
      "vec_id", "embedding", k = 3)
      .select("neighbor_id").as[Long].collect().head
    assert(out.head._2 == exact)
  }

  test("corpus is never shuffled: broadcast join + heap rank only") {
    val plan = Quantization.topKInt8(vecs.filter($"vec_id" === 0L), vecs,
      "vec_id", "embedding", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}

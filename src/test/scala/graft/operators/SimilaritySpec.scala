package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1f, 0f, 0f, 0f), 0),
    (1L, Seq(0.9f, 0.1f, 0f, 0f), 0),   // close to 0
    (2L, Seq(0f, 1f, 0f, 0f), 1),
    (3L, Seq(0f, 0.95f, 0.05f, 0f), 1), // close to 2
    (4L, Seq(-1f, 0f, 0f, 0f), 2),      // opposite of 0
    (5L, Seq(1f, 0f, 0f, 0f), 0))       // duplicate of 0
    .toDF("vec_id", "embedding", "label")

  test("vector functions: dot, norm, cosine") {
    val r = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .select(
        VectorFunctions.dot($"a", $"b").as("d"),
        VectorFunctions.norm($"a").as("n"),
        VectorFunctions.cosine($"a", $"a").as("self"))
      .first()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    // zero vector → cosine 0, not NaN
    val z = Seq((Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b")).first().getDouble(0)
    assert(z == 0.0)
  }

  test("brute top-k: nearest neighbors in cosine order") {
    val out = Similarity.bruteTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(5L, 1L, 2L))
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("brute top-k with string ids: window fallback, ids preserved") {
    // non-integral ids can't ride the (double, bigint) heap aggregate —
    // the window path must kick in, keep the id type, and agree with
    // the long-id formulation on the same data
    val svecs = vecs.select(concat(lit("doc-"), $"vec_id").as("vec_id"),
      $"embedding")
    val out = Similarity.bruteTopK(
      svecs.filter($"vec_id" === "doc-0"), svecs, "vec_id", "embedding",
      k = 3).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("neighbor_id")).toSeq ==
      Seq("doc-5", "doc-1", "doc-2"))
    assert(out.head.getAs[Double]("cosine") == 1.0)
  }

  test("srp top-k recalls the duplicate and near vector") {
    val out = Similarity.srpTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
      k = 3, numPlanes = 4, dim = 4)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(out.contains(5L), s"srp missed the exact duplicate: $out")
  }

  test("label centroids") {
    val c = Similarity.labelCentroids(vecs, "label", "embedding")
      .orderBy("label").collect()
    val c0 = c(0).getSeq[Double](c(0).fieldIndex("centroid"))
    assert(math.abs(c0.head - (1.0 + 0.9 + 1.0) / 3) < 1e-6)
    assert(c.length == 3)
  }

  test("ANN rank stage is aggregate-based: no Window in the plan") {
    // the per-query rank must run as a partial-aggregating heap, not a
    // window — a window shuffles every scored candidate into |queries|
    // partitions (the straggler stage at scale)
    val plan = Similarity.bruteTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank stage still uses a window:\n$plan")
    assert(plan.contains("top_k_by_score"), "expected the heap aggregate")
  }

  test("embedding near-dups drops oversized buckets") {
    // with maxBucketSize=1 every pairable (size>=2) bucket is over the
    // cap, so every candidate pair must disappear
    val none = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.0, numPlanes = 1, dim = 4, maxBucketSize = 1)
      .count()
    assert(none == 0L, "oversized buckets must be dropped, not joined")
  }

  test("embedding near-dups finds the duplicate pair") {
    val pairs = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.99, numPlanes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 5L)), s"missing dup pair: $pairs")
    assert(!pairs.contains((0L, 4L)), "opposite vectors must not pair")
  }

  test("recallAtK: per-query overlap against the exact result") {
    val exact = Seq((0L, 1L), (0L, 5L), (2L, 3L), (2L, 1L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((0L, 1L), (0L, 5L), (2L, 4L)) // query 2: 0 of 2 hit
      .toDF("query_id", "neighbor_id")
    val r = Similarity.recallAtK(approx, exact)
      .as[(Long, Double)].collect().toMap
    assert(r == Map(0L -> 1.0, 2L -> 0.0), r)
    // self-recall is exactly 1 everywhere
    val self = Similarity.recallAtK(exact, exact)
      .as[(Long, Double)].collect().toMap
    assert(self.values.forall(_ == 1.0), self)
  }
}

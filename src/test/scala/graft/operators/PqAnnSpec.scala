package graft.operators

import graft.SparkSpec

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters in 8 dims (2 subspaces of 4): PQ codes must
  // separate them cleanly
  private lazy val vecs = {
    val a = (0 until 20).map(i =>
      (i.toLong, Seq(1f, 0.01f * i, 0f, 0f, 1f, 0f, 0.01f * i, 0f)))
    val b = (20 until 40).map(i =>
      (i.toLong, Seq(0f, 1f, 0.01f * (i - 20), 0f, 0f, 1f, 0f, 0.02f * (i - 20))))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("codebooks are deterministic, bounded, and cover every subspace") {
    def run() = PqAnn.codebooks(vecs, "vec_id", "embedding",
      numSub = 2, subDim = 4, ksub = 4, iterations = 2)
      .collect().map(_.toString).sorted.toSeq
    val c1 = run(); val c2 = run()
    assert(c1 == c2)
    val byM = PqAnn.trainedCodebook(vecs, "vec_id", "embedding",
      numSub = 2, subDim = 4, ksub = 4, iterations = 2)
    assert(byM.cells.length == 2)
    byM.cells.foreach { cs =>
      assert(cs.nonEmpty && cs.length <= 4)
      assert(cs.map(_._1).toSeq == cs.map(_._1).sorted.toSeq) // cell-id order
      cs.foreach { case (_, cent) => assert(cent.length == 4) }
    }
  }

  test("pq top-k stays within the query's cluster and finds the nearest") {
    val out = PqAnn.topK(vecs.filter($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 5, numSub = 2, subDim = 4, ksub = 4,
      iterations = 2).collect()
    assert(out.length == 5)
    val neighbors = out.map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors.forall(_ < 20), s"cross-cluster leak: $neighbors")
  }

  test("adc recall at cluster size is exact on separable data") {
    // PQ quantizes hard at ksub=4: within a cluster many vectors share
    // codes and tie, so top-5 membership vs the cosine-ranked brute
    // search is not stable — but the full 19-member cluster must be
    // recovered exactly by both searches (cross-cluster dots ~0)
    val q = vecs.filter($"vec_id" < 5)
    val approx = PqAnn.topK(q, vecs, "vec_id", "embedding", k = 19,
      numSub = 2, subDim = 4, ksub = 4, iterations = 2)
    val exact = Similarity.bruteTopK(q, vecs, "vec_id", "embedding", k = 19)
    val recall = Similarity.recallAtK(approx, exact)
      .agg(org.apache.spark.sql.functions.avg("recall")).first().getDouble(0)
    assert(recall == 1.0, s"cluster not fully recovered: $recall")
  }

  test("serving path never shuffles or explodes the corpus") {
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // kernels, so the executed plan shows the real serving shape
    val plan = PqAnn.topK(vecs.filter($"vec_id" === 0), vecs.repartition(2),
      "vec_id", "embedding", k = 3, numSub = 2, subDim = 4, ksub = 4,
      iterations = 1).queryExecution.executedPlan.toString
    assert(plan.contains("pq_encode") && plan.contains("pq_adc"),
      s"expected in-row PQ kernels:\n$plan")
    assert(plan.contains("top_k_by_score"),
      s"rank must ride the bounded-heap aggregate:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"nothing in the serving path may shuffle-join:\n$plan")
    // the only Generate is the rank stage's posexplode of the k-row
    // heap output — the corpus itself must not pass through a Generate
    val corpusSide = plan.split("BroadcastNestedLoopJoin").last
    assert(!corpusSide.contains("Generate"),
      s"corpus side must stay scan -> kernel -> heap aggregate:\n$plan")
  }
}

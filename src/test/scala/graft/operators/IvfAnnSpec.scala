package graft.operators

import graft.SparkSpec

class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes + a duplicate query point
  private lazy val vecs = {
    val a = (0 until 20).map(i =>
      (i.toLong, Seq(1f, 0.01f * i, 0f, 0f), 0))
    val b = (20 until 40).map(i =>
      (i.toLong, Seq(0f, 1f, 0.01f * (i - 20), 0f), 1))
    (a ++ b).toDF("vec_id", "embedding", "label")
  }

  test("centroids are deterministic and cell count is bounded") {
    val c1 = IvfAnn.centroids(vecs, "vec_id", "embedding", nCells = 4)
      .collect().map(_.toString).sorted.toSeq
    val c2 = IvfAnn.centroids(vecs, "vec_id", "embedding", nCells = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(c1 == c2)
    assert(c1.size <= 4 && c1.nonEmpty)
  }

  test("assignment puts each vector in exactly one cell") {
    val cents = IvfAnn.centroids(vecs, "vec_id", "embedding", nCells = 4)
    val assigned = IvfAnn.assign(vecs, "vec_id", "embedding", cents)
    assert(assigned.count() == 40)
    assert(assigned.select("vec_id").distinct().count() == 40)
  }

  test("ivf top-k recalls in-cluster neighbors") {
    val out = IvfAnn.topK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 2)
      .collect()
    assert(out.nonEmpty)
    val neighbors = out.map(_.getAs[Long]("neighbor_id")).toSet
    // all results must come from cluster A (cosine to cluster B ~0)
    assert(neighbors.forall(_ < 20), s"cross-cluster leak: $neighbors")
    // the nearest in-cluster vector is recalled
    assert(neighbors.contains(1L), s"missed nearest: $neighbors")
  }

  test("persisted index: pruned probe matches the in-memory search") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfAnn.buildIndex(vecs, "vec_id", "embedding", dir,
      nCells = 4, iterations = 2)
    val q = vecs.filter($"vec_id" === 0)
    val fromIndex = IvfAnn.topKFromIndex(spark, dir, q,
      "vec_id", "embedding", k = 5, nProbe = 2)
    val inMemory = IvfAnn.topK(q, vecs, "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 2, iterations = 2)
    assert(fromIndex.orderBy("query_id", "rank").collect().toSeq ==
      inMemory.orderBy("query_id", "rank").collect().toSeq)

    // the probe scan must PRUNE partitions at planning time, not
    // filter a full scan: nProbe of nCells directories read
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_id"),
      s"probed read must partition-prune on cell_id:\n$plan")
  }
}

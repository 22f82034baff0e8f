package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups on orthogonal axes plus a lone outlier; with
  // nCells = 2 the groups separate and the outlier joins one of them
  // but pairs with nothing above the threshold
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f, 0.0f)),   // near-dup of 1
    (3L, Array(0.98f, -0.15f, 0.0f, 0.0f)), // near-dup of 1
    (8L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (9L, Array(0.0f, 0.0f, 0.97f, 0.2f)),   // near-dup of 8
    (99L, Array(0.0f, 0.6f, 0.0f, -0.8f))   // similar to nothing
  ).toDF("vec_id", "embedding")

  private lazy val out = SemDedup.verdicts(vecs, "vec_id", "embedding",
    threshold = 0.9, nCells = 2, iterations = 2)
    .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap

  test("every document gets a verdict") {
    assert(out.keySet == Set(1L, 2L, 3L, 8L, 9L, 99L))
  }

  test("the smallest id of each duplicate group survives") {
    assert(out(1L)._2, "group min survives")
    assert(!out(2L)._2, "larger near-dup dropped")
    assert(!out(3L)._2, "larger near-dup dropped")
    assert(out(8L)._2, "second group min survives")
    assert(!out(9L)._2, "second group near-dup dropped")
  }

  test("documents without a close neighbor are kept") {
    assert(out(99L)._2)
  }

  test("duplicate groups land in one cell") {
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1)
    assert(out(8L)._1 == out(9L)._1)
  }

  test("survivors returns exactly the kept rows") {
    val s = SemDedup.survivors(vecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 2, iterations = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s == Set(1L, 8L, 99L))
  }

  test("auto-k sizes the cell count with the corpus (linear scale path)") {
    // the sizing formula itself, asserted directly: k = max(16,
    // ceil(N / targetCellSize)) — doubling the corpus doubles k, so
    // per-cell volume (the quadratic pair term) stays bounded instead
    // of doubling. (Populated-cell counts are NOT asserted: hash-based
    // seeding can legitimately leave cells empty.)
    assert(SemDedup.chooseK(4096L, -1, 256) == 16)
    assert(SemDedup.chooseK(8192L, -1, 256) == 32)
    assert(SemDedup.chooseK(500L, -1, 2048) == 16, "floor engages")
    assert(SemDedup.chooseK(200000L, -1, 2048) == 98, "ceil, not floor div")
    assert(SemDedup.chooseK(200000L, 16, 2048) == 16, "explicit k wins")

    val big = (0L until 4096L).map(i =>
      (i, Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat)))
      .toDF("vec_id", "embedding")
    val v = SemDedup.verdicts(big, "vec_id", "embedding",
      threshold = 0.999, targetCellSize = 256)
    assert(v.count() == 4096, "every document verdicted under auto-k")
    val cellIds = v.select("cell_id").distinct()
      .collect().map(_.getInt(0))
    assert(cellIds.max < 16, "cell ids come from the k=16 seed range")
    // the property the formula exists for: no cell grows past a small
    // multiple of the target even on this lumpy synthetic ring
    val sizes = v.groupBy("cell_id").count().collect().map(_.getLong(1))
    assert(sizes.max <= 8L * 256,
      s"per-cell population stays bounded (max ${sizes.max})")
  }

  test("the pairable broadcast hint is bounded by k (r15): past BroadcastableCells the cells join degrades to a shuffled hash build on the SAME side") {
    // auto-k scales k linearly with the corpus, so "pairable is tiny"
    // holds only up to a bound — past it a forced broadcast of the
    // cell-id list would override AQE's size threshold and OOM exactly
    // where the hint was meant to prevent an OOM. k is driver-side, so
    // the guard is exact; both regimes pin the build side OFF the
    // corpus. Static plans (pre-AQE), where the hints' effect lives.
    def plan(k: Int): String = SemDedup.verdicts(vecs, "vec_id",
      "embedding", threshold = 0.9, nCells = k, iterations = 1)
      .queryExecution.sparkPlan.toString
    val small = plan(2)
    assert(small.contains("BroadcastHashJoin"), small.take(1500))
    assert(!small.contains("ShuffledHashJoin"),
      s"small-k regime must broadcast, not shuffle: ${small.take(1500)}")
    val big = plan(SemDedup.BroadcastableCells + 1)
    val shj = big.linesIterator.filter(_.contains("ShuffledHashJoin")).toSeq
    assert(shj.nonEmpty,
      s"guard did not fall back to shuffle_hash: ${big.take(1500)}")
    // pairable is the RIGHT side of cells.join(pairable): the build
    // side must stay there — never the corpus
    assert(shj.forall(_.contains("BuildRight")), shj.mkString("\n"))
  }

  test("oversized cells pair nothing (guard)") {
    val all = SemDedup.verdicts(vecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 1, iterations = 1, maxCellSize = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // one cell of 6 members > maxCellSize 3: everyone kept
    assert(all.values.forall(identity))
  }
}

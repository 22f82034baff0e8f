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
    // with nCells <= 0, k = max(16, ceil(N / targetCellSize)): per-cell
    // population — and so the quadratic pair scan — stays bounded as
    // the corpus grows, the property that keeps total pair work linear
    val big = (0L until 4096L).map(i =>
      (i, Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat,
        math.cos(i * 0.11).toFloat, math.sin(i * 0.11).toFloat)))
      .toDF("vec_id", "embedding")
    val v = SemDedup.verdicts(big, "vec_id", "embedding",
      threshold = 0.999, targetCellSize = 256)
    val cellSizes = v.groupBy("cell_id").count()
      .collect().map(_.getLong(1))
    assert(cellSizes.length > 8 && cellSizes.length <= 16, // k = 4096/256
      s"auto-k chose ${cellSizes.length} populated cells of k=16")
    assert(v.count() == 4096, "every document verdicted under auto-k")
    // doubling the corpus doubles k — per-cell volume (the quadratic
    // term) stays bounded instead of doubling
    val bigger = big.unionAll(big.select(
      (col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    val v2 = SemDedup.verdicts(bigger, "vec_id", "embedding",
      threshold = 0.999, targetCellSize = 256)
    val sizes2 = v2.groupBy("cell_id").count().collect().map(_.getLong(1))
    assert(sizes2.length > 16 && sizes2.length <= 32,
      s"k scales with N (got ${sizes2.length} populated cells of k=32)")
    assert(sizes2.max <= 8L * 256,
      s"per-cell population stays bounded (max ${sizes2.max})")
  }

  test("oversized cells pair nothing (guard)") {
    val all = SemDedup.verdicts(vecs, "vec_id", "embedding",
      threshold = 0.9, nCells = 1, iterations = 1, maxCellSize = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // one cell of 6 members > maxCellSize 3: everyone kept
    assert(all.values.forall(identity))
  }
}

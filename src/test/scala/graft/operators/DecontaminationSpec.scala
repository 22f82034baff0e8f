package graft.operators

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "What is the capital of France Paris is the capital and largest city"),
    (101L, "Photosynthesis converts light energy into chemical energy in plants"))
    .toDF("doc_id", "text")

  private lazy val corpus = Seq(
    (1L, "What is the capital of France Paris is the capital and largest city"), // verbatim leak
    (2L, "What is the capital of France Paris is the capital and largest town"), // near leak
    (3L, "Completely unrelated prose about distributed query engine design"),
    (4L, "the and of to in is that it was for with as his on be"))
    .toDF("doc_id", "text")

  test("verbatim and near leaks are flagged; unrelated text is not") {
    val hits = Decontamination.contaminated(corpus, bench, "doc_id", "text",
      threshold = 0.5)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((1L, 100L)), s"verbatim leak missed: $hits")
    assert(hits.contains((2L, 100L)), s"near leak missed: $hits")
    assert(!hits.exists(_._1 == 3L), s"false positive: $hits")
  }

  test("clean() drops exactly the contaminated documents") {
    val kept = Decontamination.clean(corpus, bench, "doc_id", "text",
      threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(3L, 4L), s"kept: $kept")
  }

  test("benchmark side broadcasts; corpus is never shuffled for the join") {
    val plan = Decontamination.contaminated(corpus, bench, "doc_id", "text",
      threshold = 0.5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"benchmark side must broadcast:\n$plan")
    // every join in the operator (banding, guard, verify) must be a
    // broadcast join — a SortMergeJoin would mean corpus-scale rows
    // (or corpus shingle sets) got shuffled
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-side rows must never shuffle through a join:\n$plan")
  }

  test("dedupAgainst drops delta docs already present in the corpus") {
    val delta = Seq(
      (200L, "What is the capital of France Paris is the capital and largest city"), // dup of corpus 1
      (201L, "Entirely novel content about bounded heap aggregates in map side combine"))
      .toDF("doc_id", "text")
    val kept = Decontamination.dedupAgainst(delta, corpus, "doc_id", "text",
      threshold = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(201L), s"kept: $kept")
  }

  test("corpus never pairs against an empty-shingle benchmark row") {
    val emptyBench = Seq((200L, "")).toDF("doc_id", "text")
    assert(Decontamination.contaminated(corpus, emptyBench,
      "doc_id", "text", threshold = 0.1).count() == 0L)
  }

  test("ngramOverlap counts hit positions and keeps shingle-less docs") {
    val b = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val c = Seq(
      // quotes the benchmark 4-gram "beta gamma delta epsilon" once,
      // inside otherwise-novel text: 5 shingles total, 1 hit
      (1L, "prefix beta gamma delta epsilon novel suffix words"),
      (2L, "entirely unrelated prose about catalyst physical planning"),
      (3L, "too short")) // < n tokens → 0 shingles, clean
      .toDF("doc_id", "text")
    val out = Decontamination.ngramOverlap(c, b, "doc_id", "text", n = 4)
      .select("doc_id", "n_shingles", "hit_shingles", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 5L, 1L, true),
      (2L, 4L, 0L, false),
      (3L, 0L, 0L, false)), s"got: $out")
  }

  test("ngramOverlap joins are broadcast-only; one doc-keyed shuffle") {
    val plan = Decontamination.ngramOverlap(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus rows must not shuffle through the membership join:\n$plan")
  }
}

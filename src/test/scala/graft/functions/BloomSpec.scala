package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Dedup

class BloomSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private val M = 1 << 12
  private val K = 4

  test("positions are deterministic, k-long, and in range") {
    val df = Seq("a", "b", "a", "").toDF("s")
      .select(Bloom.positions(col("s"), K, M).as("p"))
    val rows = df.collect().map(_.getSeq[Int](0))
    rows.foreach { p =>
      assert(p.length == K)
      p.foreach(x => assert(x >= 0 && x < M))
    }
    assert(rows(0) == rows(2)) // same key, same positions
    assert(rows(0) != rows(1))
  }

  test("no false negatives: every inserted key probes positive") {
    val keys = (1 to 200).map(i => s"key-$i-${i * 31}")
    val df = keys.toDF("s")
      .select(col("s"), Bloom.positions(col("s"), K, M).as("p"))
    val bm = df.agg(Bloom.filterAgg(col("p"), M).as("bm"))
    val hits = df.crossJoin(broadcast(bm))
      .select(Bloom.mightContain(col("bm"), col("p")).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity))
  }

  test("partial aggregation: bitmap is partition-count invariant") {
    val keys = (1 to 500).map(i => s"doc $i")
    def bitmap(parts: Int): Seq[Long] = keys.toDF("s")
      .repartition(parts)
      .select(Bloom.positions(col("s"), K, M).as("p"))
      .agg(Bloom.filterAgg(col("p"), M).as("bm"))
      .collect()(0).getSeq[Long](0)
    assert(bitmap(1) == bitmap(7))
  }

  test("bloomNewDocs: is_dup matches the exact anti-join; hits cover dups") {
    val corpus = (1L to 300L).map(i => (i, s"text number $i")).toDF("doc_id", "text")
    // delta: 20 true dups (same text, new ids) + 20 genuinely new
    val delta = ((1L to 20L).map(i => (1000 + i, s"text number $i")) ++
      (1L to 20L).map(i => (2000 + i, s"fresh content $i")))
      .toDF("doc_id", "text")
    val out = Dedup.bloomNewDocs(corpus, delta, "doc_id", "text",
      numBits = 1 << 14, numHashes = 5).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.length == 40)
    out.foreach { case (id, hit, dup) =>
      assert(dup == (id <= 1020), s"is_dup wrong for $id")
      if (dup) assert(hit, s"false negative for $id") // bloom guarantee
    }
  }

  test("the corpus-side verify join broadcasts the candidate keys") {
    val corpus = (1L to 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val delta = Seq((100L, "t1"), (101L, "zz")).toDF("doc_id", "text")
    val plan = Dedup.bloomNewDocs(corpus, delta, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_filter_agg"), s"missing bloom aggregate:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"expected broadcast of bitmap and candidate keys:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must never shuffle for the verify join:\n$plan")
  }
}

package graft.operators

import graft.SparkSpec

class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  // docs 1 and 2 share the 6-token run "a b c d e f" (tokens 2..7 in
  // doc 1, tokens 0..5 in doc 2); doc 3 shares nothing long enough
  private lazy val docs = Seq(
    (1L, "x y a b c d e f z w q r"),
    (2L, "a b c d e f p q s t u v"),
    (3L, "m n o p q r s t u v w x")
  ).toDF("doc_id", "text")

  private def run(k: Int, maxDocs: Int = 1) =
    RepeatedSpans.spans(docs, "doc_id", "text", k, maxDocs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("a shared 6-token run surfaces as one maximal span per doc") {
    val out = run(k = 4)
    // 6-token run with k=4 -> 3 consecutive repeated shingles
    val d1 = out.filter(_._1 == 1L)
    val d2 = out.filter(_._1 == 2L)
    assert(d1.exists(s => s._3 == 2L && s._4 == 7L && s._5 == 3L),
      s"doc1 spans: ${d1.toSeq}")
    assert(d2.exists(s => s._3 == 0L && s._4 == 5L && s._5 == 3L),
      s"doc2 spans: ${d2.toSeq}")
  }

  test("span boundaries are exact, not chunk-rounded") {
    val out = run(k = 4)
    // nothing extends beyond the true shared run in doc 1 (tokens 2..7)
    val d1 = out.filter(_._1 == 1L)
    assert(d1.forall(s => s._3 >= 2L && s._4 <= 7L))
  }

  test("disjoint repeats produce separate spans with ordered indexes") {
    val d = Seq(
      (1L, "r1 r1 r1 r1 gap1 gap2 r2 r2 r2 r2"),
      (2L, "r1 r1 r1 r1 other words r2 r2 r2 r2")
    ).toDF("doc_id", "text")
    val out = RepeatedSpans.spans(d, "doc_id", "text", spanTokens = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.length == 2)
    assert(doc1.map(_._2).toSeq == Seq(1L, 2L), "span_idx ordered")
    assert(doc1(0)._3 < doc1(1)._3, "indexed by start position")
  }

  test("maxDocs threshold suppresses rarer repeats") {
    // with maxDocs = 2 a shingle must appear in 3+ docs; nothing does
    assert(run(k = 4, maxDocs = 2).isEmpty)
  }

  test("documents shorter than the span window emit nothing") {
    val d = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(RepeatedSpans.spans(d, "doc_id", "text", spanTokens = 4)
      .collect().isEmpty)
  }
}

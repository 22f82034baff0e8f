package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple cherry"),  // tf(apple)=2
    (2L, "apple kiwi kiwi kiwi"),       // tf(apple)=1, longer-irrelevant
    (3L, "banana banana banana"),       // banana-heavy
    (4L, "cherry date elderberry fig grape honeydew"), // long, 1 rare term
    (5L, "plum")                        // no query terms
  ).toDF("doc_id", "text")

  private def result(terms: String*) =
    Bm25.search(docs, "doc_id", "text", terms, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("only documents matching at least one term are returned") {
    assert(result("apple", "banana").map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("matched_terms counts distinct query terms present") {
    val m = result("apple", "banana", "cherry").map(r => r._1 -> r._2).toMap
    assert(m(1L) == 3L)
    assert(m(2L) == 1L)
    assert(m(3L) == 1L)
  }

  test("higher term frequency ranks higher, all else equal") {
    val r = result("apple")
    // doc 1 has tf=2 in 4 tokens; doc 2 tf=1 in 4 tokens
    assert(r.head._1 == 1L)
    assert(r.head._3 > r(1)._3)
  }

  test("rarer terms contribute more (idf)") {
    // "cherry" appears in 2 docs, "banana" in 2; "fig" in 1
    val fig = result("fig").head._3
    val banana = result("banana").filter(_._1 == 1L).head._3
    assert(fig > banana) // tf=1 each, fig is rarer and doc 4 is longer
  }

  test("matches the textbook formula on a hand-computed case") {
    // corpus: N=5, total tokens = 4+4+3+6+1 = 18, avgdl = 3.6
    // query "apple": df=2, doc 1 tf=2 dl=4
    val n = 5.0; val df = 2.0; val tf = 2.0; val dl = 4.0; val avgdl = 18.0 / 5.0
    val k1 = 1.2; val b = 0.75
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val expected =
      BigDecimal(idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + (b * dl) / avgdl))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val got = result("apple").filter(_._1 == 1L).head._3
    assert(got == expected)
  }

  test("topN bounds the result") {
    assert(result("apple", "banana", "cherry").length <= 10)
    val top2 = Bm25.search(docs, "doc_id", "text", Seq("apple", "banana"),
      topN = 2).collect()
    assert(top2.length == 2)
  }
}

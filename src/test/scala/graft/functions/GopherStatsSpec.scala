package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String) =
    Seq(text).toDF("text")
      .select(GopherStats.gopherStats(col("text")).as("f"))
      .select("f.*").collect()(0)

  test("word counters: counts, chars, alpha, stopwords") {
    val r = stats("The cat and the dog ran to 42 trees")
    assert(r.getAs[Long]("word_count") == 9L)
    // the+cat+and+the+dog+ran+to+42+trees = 3+3+3+3+3+3+2+2+5
    assert(r.getAs[Long]("token_chars") == 27L)
    assert(r.getAs[Long]("alpha_words") == 8L) // all but "42"
    // distinct stopword hits: the, and, to
    assert(r.getAs[Long]("stopword_hits") == 3L)
  }

  test("top bigram is measured in characters covered") {
    // "the cat" x3 covers 3*(3+3)=18 chars; "cat the" x2 covers 12
    val r = stats("the cat the cat the cat")
    assert(r.getAs[Long]("top_bigram_chars") == 18L)
    assert(stats("solo").getAs[Long]("top_bigram_chars") == 0L)
  }

  test("line counters: trim, bullets, ellipsis, duplicates") {
    val r = stats("  - item one\n- item one\nwait...\n\n   \nplain")
    assert(r.getAs[Long]("n_lines") == 4L) // blank + space-only dropped
    assert(r.getAs[Long]("bullet_lines") == 2L)
    assert(r.getAs[Long]("ellipsis_lines") == 1L)
    assert(r.getAs[Long]("distinct_lines") == 3L)
    // "- item one" x2 (10 chars) + "wait..." (7) + "plain" (5)
    assert(r.getAs[Long]("line_chars") == 32L)
    assert(r.getAs[Long]("dup_line_chars") == 10L)
  }

  test("empty and token-less text yield all-zero counters") {
    for (t <- Seq("", "   ", "\n\n", "!!! ???")) {
      val r = stats(t)
      assert(r.getAs[Long]("word_count") == 0L, s"text=<$t>")
      assert(r.getAs[Long]("top_bigram_chars") == 0L)
      assert(r.getAs[Long]("dup_line_chars") == 0L)
    }
    // punctuation-only text still has a (non-empty) line
    assert(stats("!!! ???").getAs[Long]("n_lines") == 1L)
  }

  test("only ASCII spaces are trimmed (DuckDB trim parity)") {
    // the tab survives trimming, so the two lines differ
    val r = stats("alpha\n\talpha")
    assert(r.getAs[Long]("distinct_lines") == 2L)
    assert(r.getAs[Long]("dup_line_chars") == 0L)
  }

  test("property: kernel counters match a naive collections reference") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def naive(s: String): Seq[Long] = {
      val toks = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2)
        .map(p => p.head + " " + p(1)).toSeq
      val topBigram =
        if (bigrams.isEmpty) 0L
        else bigrams.groupBy(identity)
          .map { case (b, o) => o.size.toLong * (b.length - 1) }.max
      val lines = s.split("\n", -1).toSeq
        .map(_.replaceAll("^ +| +$", "")).filter(_.nonEmpty)
      Seq(
        toks.size.toLong,
        toks.map(_.length.toLong).sum,
        toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong,
        GopherStatsExpr.stopwords.count(toks.contains).toLong,
        topBigram,
        lines.size.toLong,
        lines.count(l => l.head == '-' || l.head == '*').toLong,
        lines.count(_.endsWith("...")).toLong,
        lines.distinct.size.toLong,
        lines.map(_.length.toLong).sum,
        lines.map(_.length.toLong).sum - lines.distinct.map(_.length.toLong).sum)
    }
    val textGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\n'),
      1 -> Gen.const('\t'), 1 -> Gen.oneOf('-', '*', '.', '!'),
      1 -> Gen.oneOf("the", "be", "to", "of", "and").flatMap(w =>
        Gen.const(' ')).map(identity))).map(_.mkString) // spacer
      .flatMap(base => Gen.oneOf(base, base + " the cat of and",
        "- " + base + "\n" + base + "\n" + base))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100),
      Prop.forAll(textGen) { s =>
        val row = Seq(s).toDF("text")
          .select(GopherStats.gopherStats(col("text")).as("f"))
          .select("f.*").collect()(0)
        (0 until 11).forall(i => row.getLong(i) == naive(s)(i))
      })
    assert(res.passed, res.status.toString)
  }
}

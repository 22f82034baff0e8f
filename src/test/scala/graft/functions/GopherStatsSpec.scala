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
}

package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("r")).first().get(0)

  test("tokens: lowercased, punctuation-split, no empties") {
    assert(one(TextFunctions.tokens($"t"), "Hello, World! 42") ==
      Seq("hello", "world", "42"))
    assert(one(TextFunctions.tokens($"t"), "") == Seq.empty)
  }

  test("word shingles") {
    assert(one(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 2),
      "a b c d") == Seq("a b", "b c", "c d"))
    // shorter than n → single shingle of the whole text
    assert(one(TextFunctions.wordShingles(TextFunctions.tokens($"t"), 3),
      "a b") == Seq("a b"))
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one(TextFunctions.wsTokenCount($"t"), "one two three") == 3)
    val bpe = one(TextFunctions.bpeTokenCount($"t"),
      "it's working, isn't it?").asInstanceOf[Int]
    assert(bpe >= 7, s"bpe=$bpe") // it,'s,working,',',isn,'t,it,?
  }

  test("langId separates real languages, und for gibberish") {
    val cases = Seq(
      "the cat sat on the mat and it was happy with the sun" -> "en",
      "der Hund und die Katze sind nicht mit der Maus auf dem Tisch" -> "de",
      "el perro y la gata están en la casa de los abuelos con una flor" -> "es",
      "le chien et la chatte sont dans les jardins pour une promenade" -> "fr",
      "你好世界这是一个测试文档" -> "zh",
      // Japanese: kanji with kana particles/okurigana interleaved
      "これはテストです。日本語の文書を確認しています" -> "ja",
      // Korean: hangul syllable blocks
      "안녕하세요 이것은 한국어 테스트 문서입니다" -> "ko",
      "qwzx vbnm asdf ghjk tyui" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one(TextFunctions.langId($"t"), text) == expected,
        s"for: $text")
    }
  }

  test("quality score ranks clean text above junk") {
    def q(s: String) =
      one(TextFunctions.qualityScore($"t"), s).asInstanceOf[Double]
    val clean = q("The quick brown fox jumps over the lazy dog near the river bank today")
    val punct = q("!!! ??? *** $$$ ### @@@ %%% &&& ((( )))")
    val shouty = q("BUY NOW LIMITED OFFER CLICK HERE BUY NOW LIMITED OFFER")
    val repeated = q("spam spam spam spam spam spam spam spam spam spam")
    assert(clean > punct && clean > shouty && clean > repeated,
      s"clean=$clean punct=$punct shouty=$shouty repeated=$repeated")
  }

  test("fingerprints: md5 portable, min-k stable on identity") {
    assert(one(TextFunctions.md5Fingerprint($"t"), "abc") ==
      "900150983cd24fb0d6963f7d28e17f72") // public md5 test vector
    val a = one(TextFunctions.minKFingerprint($"t"), "some document body here")
    val b = one(TextFunctions.minKFingerprint($"t"), "some document body here")
    val c = one(TextFunctions.minKFingerprint($"t"), "entirely different content")
    assert(a == b && a != c)
  }

  test("quality features struct fields") {
    val f = Seq("Hello world 123!").toDF("t")
      .select(TextFunctions.qualityFeatures($"t").as("f"))
      .select("f.n_chars", "f.n_tokens", "f.digit_ratio").first()
    assert(f.getLong(0) == 16L)
    assert(f.getLong(1) == 3L)
    assert(math.abs(f.getDouble(2) - 3.0 / 16) < 1e-9)
  }
}

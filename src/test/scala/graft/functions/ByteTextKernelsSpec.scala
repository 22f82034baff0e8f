package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** The byte-level kernels must be bit-identical to the composed
  * built-in / String-path formulations they replace — on adversarial
  * inputs, not just clean prose: contractions, apostrophe runs, tabs
  * vs spaces, leading/trailing/double spaces, empty strings, and
  * non-ASCII rows (which exercise the per-row fallback + the
  * full-ASCII guard).
  */
class ByteTextKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "  ", "\t", "\n", "a", "A b  C", "it's", "they'll 've 're",
    "don't can't won't", "'", "''", "'x", "' s", " 's", "x'll", "!!'s ok",
    "end.", "a...b...", "  - bullet\n* other\nplain  \n\n- bullet\n",
    "tab\tsep", "line one\nline one\nline two", "123 45.6 7,8",
    "CAPS and MiXeD", "a-b_c+d", "élève français",
    "中文 mixed ascii", "crlf\r\nline", "sp  ace   runs",
    "'ve", "'ll've's", "a'b'c", "100%", "(paren) [brack]")

  private val rnd = new scala.util.Random(7)
  private val alphabet =
    "ab cD1!'.\n\t-*..." + "é中" // mostly-ASCII with rare non-ASCII
  private val fuzz = Seq.fill(300)(
    (0 until rnd.nextInt(200)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)

  private lazy val df = (edge ++ fuzz).toDF("text").cache()

  test("ws_token_count equals size(split(text, ' '))") {
    val bad = df.select(
      size(split($"text", " ")).as("old"),
      ByteTextKernels.wsTokenCount($"text").as("nw"), $"text")
      .where($"old" =!= $"nw").collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("bpe_token_count equals size(regexp_extract_all(...))") {
    val bad = df.select(
      TextFunctions.bpeTokenCount($"text").as("old"),
      ByteTextKernels.bpeTokenCount($"text").as("nw"), $"text")
      .where($"old" =!= $"nw").collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("gopher byte path equals the String path field by field") {
    val o = ColumnBridge.column(
      GopherStatsExpr(ColumnBridge.expression($"text"), asciiFast = false))
    val n = ColumnBridge.column(
      GopherStatsExpr(ColumnBridge.expression($"text"), asciiFast = true))
    val fields = GopherStatsExpr.schema.fields.map(_.name)
    val bad = df.select($"text", o.as("o"), n.as("n"))
      .where(fields.map(f => col(s"o.$f") =!= col(s"n.$f")).reduce(_ || _))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("d03 recomposition equals the split/replace formulation") {
    val nw = ByteTextKernels.wsTokenCount($"text")
    val bad = df.select(
      (length(regexp_replace($"text", " ", "")).cast("double") /
        size(split($"text", " "))).as("old"),
      ((length($"text") - (nw - lit(1))).cast("double") / nw).as("nw"), $"text")
      .where($"old" =!= $"nw") // NaN != NaN is false in SQL: both NaN passes
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition and structure counters (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", §A1.1) as one single-pass
  * per-row kernel — the quality-filter family every LLM data pipeline
  * runs before training. One imperative traversal per document, purely
  * map-side: at 100 TB this is scan-bound, no shuffle, no explode.
  *
  * The kernel emits INTEGER counters only; ratios (and the pass/fail
  * verdict against the published thresholds) are derived in the query
  * layer — integer counters make differential checking against another
  * engine exact, with no float-summation-order concerns.
  *
  * Parity contract with the DuckDB oracle (OracleSql.gopherStats):
  * tokens = the shared lowercase-alphanumeric tokenizer; lines = split
  * on \n, trimmed of ASCII SPACES ONLY (DuckDB `trim` semantics — NOT
  * Java's trim, which also strips tabs and \r), empties dropped.
  */
case class GopherStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GopherStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val toks = Sketch.tokenize(s)

    // ── word counters ──
    var tokenChars = 0L
    var alphaWords = 0L
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      tokenChars += w.length
      var hasAlpha = false
      var i = 0
      while (i < w.length && !hasAlpha) {
        val c = w.charAt(i)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        i += 1
      }
      if (hasAlpha) alphaWords += 1
      t += 1
    }

    // distinct canonical stopwords present (bitmask over the 8)
    var swMask = 0
    t = 0
    while (t < toks.length && swMask != 0xff) {
      val idx = GopherStatsExpr.stopwords.indexOf(toks(t))
      if (idx >= 0) swMask |= 1 << idx
      t += 1
    }
    val stopwordHits = Integer.bitCount(swMask).toLong

    // ── most-repeated word bigram, by characters covered ──
    // max over distinct bigrams of count * (len w1 + len w2): ties in
    // count resolve by taking the max product, which both engines
    // compute identically
    var topBigramChars = 0L
    if (toks.length >= 2) {
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < toks.length - 1) {
        val key = toks(i) + " " + toks(i + 1)
        counts.merge(key, 1, Integer.sum)
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val covered = e.getValue.toLong * (e.getKey.length - 1)
        if (covered > topBigramChars) topBigramChars = covered
      }
    }

    // ── line counters (space-trimmed, non-empty lines) ──
    var nLines = 0L; var bulletLines = 0L; var ellipsisLines = 0L
    var lineChars = 0L
    val lineCounts = new java.util.HashMap[String, Int]()
    var start = 0
    var pos = 0
    val n = s.length
    while (pos <= n) {
      if (pos == n || s.charAt(pos) == '\n') {
        var a = start; var b = pos
        while (a < b && s.charAt(a) == ' ') a += 1
        while (b > a && s.charAt(b - 1) == ' ') b -= 1
        if (b > a) {
          val line = s.substring(a, b)
          nLines += 1
          lineChars += line.length
          val c0 = line.charAt(0)
          if (c0 == '-' || c0 == '*') bulletLines += 1
          if (line.endsWith("...")) ellipsisLines += 1
          lineCounts.merge(line, 1, Integer.sum)
        }
        start = pos + 1
      }
      pos += 1
    }
    val distinctLines = lineCounts.size.toLong
    // chars on duplicate occurrences = total minus one copy per line
    var distinctLineChars = 0L
    val lit = lineCounts.keySet().iterator()
    while (lit.hasNext) distinctLineChars += lit.next().length
    val dupLineChars = lineChars - distinctLineChars

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, tokenChars, alphaWords, stopwordHits,
        topBigramChars, nLines, bulletLines, ellipsisLines, distinctLines,
        lineChars, dupLineChars))
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "gopher_stats"
}

object GopherStatsExpr {
  /** Gopher's "must contain 2 of" list (paper §A1.1). Order is the
    * bitmask order — semantics only need set membership.
    */
  val stopwords: IndexedSeq[String] =
    IndexedSeq("the", "be", "to", "of", "and", "that", "have", "with")

  val schema: StructType = StructType(Seq(
    StructField("word_count", LongType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false),
    StructField("top_bigram_chars", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("distinct_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false)))
}

object GopherStats {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def gopherStats(text: Column): Column =
    column(GopherStatsExpr(expression(text)))
}

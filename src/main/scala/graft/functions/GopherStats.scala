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
case class GopherStatsExpr(child: Expression, asciiFast: Boolean = true)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GopherStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (asciiFast && u.isFullAscii) return evalAscii(u)
    val s = u.toString
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

  /** Byte-level evaluation for full-ASCII rows (the measured-win path;
    * see OPERATORS.md "UTF8String byte-kernel A/B"). Bit-identical to
    * the String path: for ASCII, bytes are chars, Character.toLowerCase
    * is the +32 branch, and the packed "tok1 tok2 ..." buffer makes
    * each bigram key an exact substring — same HashMap keys, same
    * counters, no per-char decode and no full char[] materialization.
    */
  private def evalAscii(u: UTF8String): Any = {
    val arr = u.getBytes
    val n = arr.length

    // ── tokenize into a packed lowercase buffer ──
    // bound: token chars <= n, separators <= tokens - 1 <= (n-1)/2
    val packed = new Array[Byte](n + (n >> 1) + 1)
    var plen = 0
    var nToks = 0
    var tokOff = new Array[Int](16)
    var tokLen = new Array[Int](16)
    var tokenChars = 0L
    var alphaWords = 0L
    var inTok = false
    var curStart = 0
    var curAlpha = false

    @inline def endToken(): Unit = {
      if (nToks == tokOff.length) {
        tokOff = java.util.Arrays.copyOf(tokOff, nToks * 2)
        tokLen = java.util.Arrays.copyOf(tokLen, nToks * 2)
      }
      tokOff(nToks) = curStart
      tokLen(nToks) = plen - curStart
      tokenChars += plen - curStart
      if (curAlpha) alphaWords += 1
      nToks += 1
      inTok = false
    }

    var i = 0
    while (i < n) {
      val b = arr(i)
      val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      val isAl = lower >= 'a' && lower <= 'z'
      if (isAl || (lower >= '0' && lower <= '9')) {
        if (!inTok) {
          if (plen > 0) { packed(plen) = ' '; plen += 1 }
          curStart = plen; inTok = true; curAlpha = false
        }
        packed(plen) = lower; plen += 1
        if (isAl) curAlpha = true
      } else if (inTok) endToken()
      i += 1
    }
    if (inTok) endToken()

    // ── distinct canonical stopwords present (bitmask over the 8) ──
    val sw = GopherStatsExpr.stopwordBytes
    var swMask = 0
    var t = 0
    while (t < nToks && swMask != 0xff) {
      var w = 0
      while (w < sw.length) {
        val word = sw(w)
        if (word.length == tokLen(t)) {
          var j = 0
          val off = tokOff(t)
          while (j < word.length && packed(off + j) == word(j)) j += 1
          if (j == word.length) { swMask |= 1 << w; w = sw.length }
          else w += 1
        } else w += 1
      }
      t += 1
    }
    val stopwordHits = Integer.bitCount(swMask).toLong

    // ── most-repeated word bigram, by characters covered ──
    var topBigramChars = 0L
    if (nToks >= 2) {
      val counts = new java.util.HashMap[String, Int]()
      var k = 0
      while (k < nToks - 1) {
        val from = tokOff(k)
        val until = tokOff(k + 1) + tokLen(k + 1)
        counts.merge(new String(packed, from, until - from,
          java.nio.charset.StandardCharsets.ISO_8859_1), 1, Integer.sum)
        k += 1
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
    while (pos <= n) {
      if (pos == n || arr(pos) == '\n') {
        var a = start; var b = pos
        while (a < b && arr(a) == ' ') a += 1
        while (b > a && arr(b - 1) == ' ') b -= 1
        if (b > a) {
          nLines += 1
          lineChars += b - a
          val c0 = arr(a)
          if (c0 == '-' || c0 == '*') bulletLines += 1
          if (b - a >= 3 && arr(b - 1) == '.' && arr(b - 2) == '.' &&
            arr(b - 3) == '.') ellipsisLines += 1
          lineCounts.merge(new String(arr, a, b - a,
            java.nio.charset.StandardCharsets.ISO_8859_1), 1, Integer.sum)
        }
        start = pos + 1
      }
      pos += 1
    }
    val distinctLines = lineCounts.size.toLong
    var distinctLineChars = 0L
    val lit = lineCounts.keySet().iterator()
    while (lit.hasNext) distinctLineChars += lit.next().length
    val dupLineChars = lineChars - distinctLineChars

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nToks.toLong, tokenChars, alphaWords, stopwordHits,
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

  private[functions] val stopwordBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

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

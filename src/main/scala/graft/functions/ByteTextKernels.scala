package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level counting kernels for the hottest per-char entries.
  *
  * The composed built-in formulations are correct but pay for
  * intermediate materialization that a counting query never needs:
  * `size(split(text, " "))` builds an array of substring copies just to
  * take its length, and `size(regexp_extract_all(...))` allocates every
  * match. These expressions count in ONE pass over the UTF8String's
  * raw bytes with zero per-row allocation.
  *
  * Exactness: a space (0x20) can never appear inside a UTF-8 multibyte
  * sequence (continuation bytes are >= 0x80), so byte-level space
  * counting is exact for ALL inputs, not just ASCII. The BPE scanner is
  * exact for full-ASCII rows (where Java regex char classes reduce to
  * ASCII ranges) and falls back to the reference regex for any row
  * containing a non-ASCII byte — per row, so a single foreign document
  * doesn't de-optimize the corpus.
  */
private[functions] object ByteText {

  /** Count of 0x20 bytes — exact space count for any UTF-8 input. */
  def countSpaces(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }

  // ASCII character classes of the GPT-2 pre-tokenizer regex
  // '(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+
  // restricted to ASCII: \p{L}=[A-Za-z], \p{N}=[0-9],
  // \s=[ \t\n\x0B\f\r] (Java default, no UNICODE_CHARACTER_CLASS).
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Leftmost-first scan replicating `Matcher.find` over the BPE regex
    * for ASCII bytes: at each position the alternatives are tried in
    * regex order (contraction, then ` ?letters+`, ` ?digits+`,
    * ` ?symbols+`), which this scanner encodes as branch order.
    */
  def bpeCountAscii(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var count = 0

    @inline def runEnd(start: Int, cls: Byte => Boolean): Int = {
      var j = start
      while (j < n && cls(s.getByte(j))) j += 1
      j
    }
    @inline def isSymbol(b: Byte): Boolean =
      !isWs(b) && !isLetter(b) && !isDigit(b)

    while (i < n) {
      val c = s.getByte(i)
      if (c == '\'') {
        val b1 = if (i + 1 < n) s.getByte(i + 1) else 0
        val b2 = if (i + 2 < n) s.getByte(i + 2) else 0
        if (b1 == 's' || b1 == 'd' || b1 == 'm' || b1 == 't') {
          count += 1; i += 2
        } else if ((b1 == 'l' && b2 == 'l') || (b1 == 'v' && b2 == 'e') ||
                   (b1 == 'r' && b2 == 'e')) {
          count += 1; i += 3
        } else { // alternative 4: symbol run starting at the apostrophe
          count += 1; i = runEnd(i, isSymbol)
        }
      } else if (c == ' ') {
        if (i + 1 < n) {
          val d = s.getByte(i + 1)
          if (isLetter(d)) { count += 1; i = runEnd(i + 1, isLetter) }
          else if (isDigit(d)) { count += 1; i = runEnd(i + 1, isDigit) }
          else if (!isWs(d)) { count += 1; i = runEnd(i + 1, isSymbol) }
          else i += 1 // " \t", "  ", space at a no-match position
        } else i += 1 // trailing space matches nothing
      } else if (isLetter(c)) { count += 1; i = runEnd(i, isLetter) }
      else if (isDigit(c)) { count += 1; i = runEnd(i, isDigit) }
      else if (isWs(c)) i += 1
      else { count += 1; i = runEnd(i, isSymbol) }
    }
    count
  }

  /** The reference pattern, for the non-ASCII fallback (identical to
    * TextFunctions.bpeTokenCount's regexp_extract_all pattern).
    */
  val bpePattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(
    "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+")

  def bpeCountRegex(s: String): Int = {
    val m = bpePattern.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }
}

/** ws_token_count(text) → int: `size(split(text, ' '))` without the
  * array — the count of spaces plus one (split with Spark's default
  * limit -1 keeps leading/trailing empties, so segments = spaces + 1).
  */
case class WsTokenCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any =
    ByteText.countSpaces(input.asInstanceOf[UTF8String]) + 1

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "ws_token_count"
}

/** bpe_token_count(text) → int: match count of the GPT-2-style
  * pre-tokenizer regex; byte scanner on full-ASCII rows, the reference
  * regex otherwise.
  */
case class BpeTokenCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.isFullAscii) ByteText.bpeCountAscii(s)
    else ByteText.bpeCountRegex(s.toString)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

object ByteTextKernels {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def wsTokenCount(text: Column): Column =
    column(WsTokenCountExpr(expression(text)))

  def bpeTokenCount(text: Column): Column =
    column(BpeTokenCountExpr(expression(text)))
}

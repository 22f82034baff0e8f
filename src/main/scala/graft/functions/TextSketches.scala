package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-row sketch kernels as custom Catalyst Expressions.
  *
  * The composed higher-order-function formulation (tokens → shingles →
  * per-seed hash mins) is semantically clean but evaluates captured
  * subtrees PER ARRAY ELEMENT in interpreted lambda evaluation — the
  * tokenizer regex re-runs for every shingle index, turning an O(len)
  * kernel into O(len·shingles). These expressions do one imperative
  * pass per row with primitive buffers (preference (b) of the operator
  * rules: a custom Expression where built-ins can't express the
  * computation efficiently).
  */
private[functions] object Sketch {
  /** Lowercase alphanumeric tokenizer (same semantics as
    * TextFunctions.tokens) over a JVM string, allocation-light.
    */
  def tokenize(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h ^= (c & 0xffL); h *= 0x100000001b3L
      h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Word n-gram shingle hashes (joined with single spaces, matching
    * TextFunctions.wordShingles ++ xxhash-style hashing semantics at
    * the level that matters: distinct shingle ↔ distinct hash).
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.isEmpty) return Array.empty
    val count = math.max(toks.length - n + 1, 1)
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      val m = math.min(n, toks.length - i)
      while (j < m) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = fnv1a64(sb.toString)
      i += 1
    }
    out
  }

  /** Seeded affine mixers (odd multipliers) — a classic universal-ish
    * hash family for minwise sketches; JVM long arithmetic wraps.
    */
  def mixers(k: Int, seed: Long = 0x9e3779b97f4a7c15L): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L)
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }
}

/** minhash_signature(text) → array<long> of `numHashes` component mins
  * over word `shingleWords`-gram shingles. Empty text → Long.MaxValue
  * components (never collides into a band bucket with real content).
  */
case class MinHashSignature(child: Expression, shingleWords: Int,
                            numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  @transient private lazy val (mixA, mixB) = Sketch.mixers(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val hashes = Sketch.shingleHashes(
      input.asInstanceOf[UTF8String].toString, shingleWords)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < hashes.length) {
      val h = hashes(s)
      var i = 0
      while (i < numHashes) {
        val v = h * mixA(i) + mixB(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** shingle_hash_set(text) → sorted distinct array<long> of word-n-gram
  * shingle hashes (the exact-Jaccard verification sets).
  */
case class ShingleHashSet(child: Expression, shingleWords: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val hashes = Sketch.shingleHashes(
      input.asInstanceOf[UTF8String].toString, shingleWords)
    java.util.Arrays.sort(hashes)
    var n = 0
    var i = 0
    while (i < hashes.length) { // in-place dedup of the sorted array
      if (n == 0 || hashes(i) != hashes(n - 1)) { hashes(n) = hashes(i); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, n))
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "shingle_hash_set"
}

/** fnv64(s) → the FNV-1a64 hash of a string (the exact per-char
  * two-round variant `Sketch.fnv1a64` that minhash shingles use) —
  * the shared primitive for hashed-feature operators (DSIR bucket
  * hashing) so the DuckDB oracle can re-derive buckets bit-exactly
  * with the same recursive-CTE chain as the minhash family.
  */
case class Fnv64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any =
    Sketch.fnv1a64(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "fnv64"
}

/** mink_sketch(text) → 64-bit min-k document sketch over char k-grams
  * of the first `maxChars` chars (see TextFunctions.minKFingerprint for
  * semantics; this is the one-pass kernel with a bounded insertion
  * buffer instead of sort-the-world).
  */
case class MinKSketch64(child: Expression, k: Int, m: Int, maxChars: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // normalize: lowercase, whitespace runs → single space, cap length
    val sb = new java.lang.StringBuilder(math.min(raw.length, maxChars))
    var i = 0
    var lastSpace = false
    while (i < raw.length && sb.length < maxChars) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!lastSpace && sb.length > 0) { sb.append(' '); lastSpace = true }
      } else { sb.append(Character.toLowerCase(c)); lastSpace = false }
      i += 1
    }
    val s = sb.toString
    val top = Array.fill(m)(Long.MaxValue) // small descending-insert buffer
    var used = 0
    var p = 0
    val limit = math.max(s.length - k + 1, 1)
    while (p < limit) {
      val h = Sketch.fnv1a64(s.substring(p, math.min(p + k, s.length)))
      if (used == 0 || h < top(math.min(used, m) - 1) || used < m) {
        // insertion into the sorted top-m buffer, skipping duplicates
        var lo = 0
        while (lo < used && top(lo) < h) lo += 1
        if (lo >= m) () // not in top-m
        else if (lo < used && top(lo) == h) () // duplicate shingle
        else {
          var j = math.min(used, m - 1)
          while (j > lo) { top(j) = top(j - 1); j -= 1 }
          top(lo) = h
          if (used < m) used += 1
        }
      }
      p += 1
    }
    var fp = 0xcbf29ce484222325L
    var t = 0
    while (t < used) {
      fp ^= top(t); fp *= 0x100000001b3L; t += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "mink_sketch64"
}

/** lang_id(text) → language code: CJK codepoint ratio test, else argmax
  * stopword-profile hit ratio, "und" below the floor. One tokenizer
  * pass + hash-set membership per token (the HOF formulation ran the
  * tokenizer once per language profile).
  */
case class LangIdExpr(child: Expression, floor: Double)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  @transient private lazy val profiles: Array[(UTF8String, java.util.HashSet[String])] =
    TextFunctions.stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val set = new java.util.HashSet[String]()
      words.foreach(set.add)
      (UTF8String.fromString(lang), set)
    }.toArray

  private val und = UTF8String.fromString("und")
  private val zh = UTF8String.fromString("zh")
  private val ja = UTF8String.fromString("ja")
  private val ko = UTF8String.fromString("ko")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return und
    // script split inside the CJK block: hangul → ko; any meaningful
    // kana share → ja (Japanese prose mixes kana between kanji, while
    // Chinese text contains none); han-only → zh. Counts are per CODE
    // POINT and thresholds are exact integer comparisons (cjk·5 > n ⟺
    // cjk/n > 0.2) so an external SQL re-implementation — which counts
    // code points, not UTF-16 units — agrees bit-for-bit.
    var han = 0; var kana = 0; var hangul = 0; var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3400 && cp <= 0x4dbf))
        han += 1
      else if (cp >= 0x3040 && cp <= 0x30ff) kana += 1
      else if ((cp >= 0xac00 && cp <= 0xd7af) || (cp >= 0x1100 && cp <= 0x11ff))
        hangul += 1
      n += 1
      i += Character.charCount(cp)
    }
    val cjk = han + kana + hangul
    if (cjk * 5 > n) {
      if (hangul > han && hangul > kana) return ko
      if (kana * 20 > cjk) return ja
      return zh
    }
    val toks = Sketch.tokenize(s)
    if (toks.isEmpty) return und
    var best = -1
    var bestScore = 0.0
    var p = 0
    while (p < profiles.length) {
      val set = profiles(p)._2
      var hits = 0
      var t = 0
      while (t < toks.length) {
        if (set.contains(toks(t))) hits += 1
        t += 1
      }
      val score = hits.toDouble / toks.length
      // ties resolve to the lexicographically-first profile
      if (score > bestScore) { bestScore = score; best = p }
      p += 1
    }
    if (best >= 0 && bestScore >= floor) profiles(best)._1 else und
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

/** quality_stats(text) → struct of the quality features (see
  * TextFunctions.qualityFeatures for field semantics). One character
  * scan + one tokenizer pass per row — the HOF/regex formulation ran
  * five regexp_replace passes plus three tokenizations.
  */
case class QualityStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = QualityStatsExpr.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(s"expected string, got $o")
  }

  @transient private lazy val enStopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwordProfiles("en").foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var punct = 0; var digit = 0; var upper = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // ASCII classes matching the regex formulation exactly:
      // \p{Punct} = !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~ ; [0-9] ; [A-Z]
      if (c >= '!' && c <= '~' &&
        !(c >= '0' && c <= '9') && !(c >= 'A' && c <= 'Z') &&
        !(c >= 'a' && c <= 'z')) punct += 1
      if (c >= '0' && c <= '9') digit += 1
      if (c >= 'A' && c <= 'Z') upper += 1
      i += 1
    }
    val toks = Sketch.tokenize(s)
    var sw = 0
    val distinct = new java.util.HashSet[String]()
    var t = 0
    while (t < toks.length) {
      if (enStopwords.contains(toks(t))) sw += 1
      distinct.add(toks(t))
      t += 1
    }
    val nChars = s.length.toDouble
    val nonEmpty = math.max(nChars, 1.0)
    val nToks = math.max(toks.length.toDouble, 1.0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        s.length.toLong, toks.length.toLong,
        nChars / nToks, punct / nonEmpty, digit / nonEmpty,
        upper / nonEmpty,
        if (toks.isEmpty) 0.0 else sw.toDouble / toks.length,
        distinct.size / nToks))
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "quality_stats"
}

object QualityStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chars_per_token", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("upper_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("distinct_token_ratio", DoubleType, nullable = false)))
}

object TextSketches {
  import org.apache.spark.sql.graftshim.ColumnBridge._

  def langId(text: Column, floor: Double = 0.02): Column =
    column(LangIdExpr(expression(text), floor))

  def qualityStats(text: Column): Column =
    column(QualityStatsExpr(expression(text)))

  def minhashSignature(text: Column, shingleWords: Int = 3,
                       numHashes: Int = 32): Column =
    column(MinHashSignature(expression(text), shingleWords, numHashes))

  def shingleHashSet(text: Column, shingleWords: Int = 3): Column =
    column(ShingleHashSet(expression(text), shingleWords))

  def minKSketch(text: Column, k: Int = 8, m: Int = 8,
                 maxChars: Int = 512): Column =
    column(MinKSketch64(expression(text), k, m, maxChars))

  def fnv64(s: Column): Column =
    column(Fnv64Expr(expression(s)))

  /** The shared hashed-LM bucket family: low bits of the term's
    * FNV-1a64 (numBuckets must be a power of two so the mask equals
    * unsigned mod). This exact expression is the parity contract of
    * every bucket-table oracle (DSIR, NgramLm, NaiveBayes) — change
    * it ONLY together with the OracleSql replicas.
    */
  def fnvBucket(term: Column, numBuckets: Int): Column = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two: $numBuckets")
    fnv64(term)
      .bitwiseAND(org.apache.spark.sql.functions.lit(numBuckets - 1L))
      .cast("int")
  }

  /** JVM-side FNV-1a64 (test/reference use, same kernel the column
    * form evaluates).
    */
  def fnv64Ref(s: String): Long = Sketch.fnv1a64(s)

  /** The minhash mixer constants (a_i odd, b_i), for external exact
    * re-implementations of the signature family (the DuckDB oracle).
    */
  def minhashMixers(k: Int): (Array[Long], Array[Long]) = Sketch.mixers(k)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, token counting, language ID, quality
  * scoring, fingerprinting.
  *
  * Everything here composes built-in `org.apache.spark.sql.functions`
  * (higher-order array functions included) — no UDFs — so every column
  * stays inside whole-stage codegen and scales with the scan. The only
  * exception in this package is SimHash64, a custom Catalyst Expression.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens; empty strings filtered out. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace token count — cheapest corpus-size estimator. */
  def wsTokenCount(text: Column): Column =
    size(split(text, " "))

  /** BPE-ish token-count estimate: counts matches of a GPT-2-style
    * pre-tokenizer regex (letters run / digits run / punctuation run,
    * each with optional leading space). ~chars/4 heuristics replaced by
    * an actual split count, still pure codegen.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"), lit(0)))

  /** Sliding word n-gram shingles, joined with single spaces. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Sliding character k-gram shingles over the normalized text. */
  def charShingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    when(length(norm) <= k, array(norm))
      .otherwise(transform(
        sequence(lit(1), length(norm) - (k - 1)),
        i => norm.substr(i, lit(k))))
  }

  // ── language identification (n-gram/stopword heuristic) ─────────────

  /** Minimal public stopword profiles; enough signal to separate the
    * supported European languages, with a CJK-codepoint ratio test for
    * Chinese/Japanese/Korean scripts.
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "his", "on", "be"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "sich", "auf", "ich"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un", "con", "una", "es"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "un", "une", "du", "dans", "qui", "pour", "pas", "sur", "ce"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "un", "del", "una", "sono", "con", "non", "si", "le", "nel"),
    "pt" -> Seq("o", "a", "de", "que", "e", "do", "da", "em", "um", "para", "com", "os", "uma", "dos", "não"))

  /** Per-language stopword hit ratio over the token list. */
  def langScore(toks: Column, lang: String): Column = {
    val sw = array(stopwordProfiles(lang).map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Heuristic language ID:
    *  - CJK codepoint ratio > 0.2 → "zh" (script-level call);
    *  - else argmax of stopword-profile ratios, "und" when no profile
    *    clears the floor (pure word-salad / code / gibberish).
    * One tokenizer pass per row via the LangIdExpr kernel.
    */
  def langId(text: Column, floor: Double = 0.02): Column =
    TextSketches.langId(text, floor)

  // ── quality scoring ─────────────────────────────────────────────────

  /** Raw quality features as a struct column (length, token shape,
    * punctuation/digit/upper ratios, English stopword ratio,
    * repetition). One-pass QualityStatsExpr kernel.
    */
  def qualityFeatures(text: Column): Column =
    TextSketches.qualityStats(text)

  /** Scalar quality score in [0,1]: documents lose points for extreme
    * length, punctuation/digit floods, shouting, low vocabulary
    * diversity, and missing stopwords (boilerplate/code smell).
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromFeatures(qualityFeatures(text))

  /** Score from an already-computed feature struct — callers selecting
    * both features and score evaluate the (regex-heavy) features once.
    */
  def qualityScoreFromFeatures(f: Column): Column = {
    val lenOk = when(f.getField("n_tokens").between(5, 100000), 1.0).otherwise(0.3)
    val punctOk = lit(1.0) - least(f.getField("punct_ratio") * 3.0, lit(1.0))
    val digitOk = lit(1.0) - least(f.getField("digit_ratio") * 3.0, lit(1.0))
    val upperOk = lit(1.0) - least(f.getField("upper_ratio") * 4.0, lit(1.0))
    val divOk = least(f.getField("distinct_token_ratio") * 2.0, lit(1.0))
    round((lenOk * 0.3 + punctOk * 0.2 + digitOk * 0.15 + upperOk * 0.15 + divOk * 0.2), 4)
  }

  // ── fingerprinting ──────────────────────────────────────────────────

  /** Exact content fingerprint (md5 hex — portable across engines). */
  def md5Fingerprint(text: Column): Column = md5(text)

  /** Robust document sketch: the m smallest 64-bit hashes over the
    * char-k-gram shingle set (a min-k rolling-hash sketch — stable
    * under small edits), collapsed to one 64-bit value. Near-identical
    * documents collide; unrelated ones don't.
    *
    * Sketches only the first `maxChars` characters: the sketch's
    * discriminating power saturates long before that, and capping keeps
    * per-row cost bounded regardless of document length (a 1 MB outlier
    * must not own the task). Dedup on hashed longs, not strings, and
    * sort before distinct — both orders of magnitude cheaper at width.
    */
  def minKFingerprint(text: Column, k: Int = 8, m: Int = 8,
                      maxChars: Int = 512): Column =
    TextSketches.minKSketch(text, k, m, maxChars)
}

package graft.queries

/** DuckDB re-implementations of the sketch kernels' EXACT hash
  * families, generated as oracle SQL. These upgrade the flagship dedup
  * operators (d08 minhash-LSH, d09 simhash, d12 end-to-end curation)
  * from rows-only checks to full differential hash checks.
  *
  * Why this is exactly replicable:
  *  - The shingle/token base hash is FNV-1a64 (Sketch.fnv1a64 /
  *    SimHash64.fnv1a64). Its per-step multiply is 64×41 bits —
  *    under 2^105, so it fits DuckDB's HUGEINT with an explicit
  *    `% 2^64` for the JVM's wrapping long arithmetic. The per-char
  *    loop runs as a recursive CTE over string positions.
  *  - The minhash mixers are affine (v = h·a_i + b_i mod 2^64) with
  *    full 64-bit a_i: h·a_i is decomposed as h·aLo + ((h mod 2^32)·
  *    aHi mod 2^32)·2^32, each term HUGEINT-safe. The constants are
  *    inlined from the same JVM family (TextSketches.minhashMixers).
  *  - Band buckets join on the signature SLICE VALUES — Spark buckets
  *    on xxhash64(slice), but two docs collide iff their slices are
  *    equal, so the candidate set is identical (modulo ~2^-64 xxhash
  *    collisions, which would also be a Spark-side false positive).
  *  - est/exact Jaccard are ratios of small ints — bit-identical
  *    doubles on both engines.
  */
object OracleSql {

  private val P64 = "18446744073709551616" // 2^64
  private val FnvPrime = "1099511628211"
  private val FnvInit = "14695981039346656037"

  /** (i, aHi, aLo, bUnsigned) literal rows for the k mixers. */
  private def mixersValues(k: Int): String = {
    val (a, b) = graft.functions.TextSketches.minhashMixers(k)
    val m64 = (BigInt(1) << 64) - 1
    (0 until k).map { i =>
      val au = BigInt(a(i)) & m64
      val bu = BigInt(b(i)) & m64
      s"($i,${au >> 32},${au & 0xffffffffL},$bu)"
    }.mkString(",")
  }

  /** The tokenizer both engines share (TextFunctions.tokens /
    * Sketch.tokenize parity, proven by the green d07/d13 oracles).
    */
  private def toksExpr(textCol: String): String =
    s"list_filter(string_split_regex(lower($textCol), '[^a-z0-9]+'), x -> len(x) > 0)"

  /** Shared CTE chain: word-n-gram shingles of `srcCte(doc_id, t)` →
    * FNV-1a64 per shingle → k-component minhash signatures →
    * band-sliced LSH candidates with the bucket-size guard →
    * `cand(id_a, id_b, sig_a, sig_b)` + `sets(doc_id, ss)` for the
    * exact-Jaccard verify. Prepend `WITH <prefix>` CTEs providing
    * `$srcCte` with columns (doc_id, t).
    */
  private def lshCtes(srcCte: String, shingleWords: Int, numHashes: Int,
                      bands: Int, maxBucketSize: Int): String = {
    val n1 = shingleWords - 1
    val r = numHashes / bands
    s"""mixers(i, ahi, alo, bu) AS (VALUES ${mixersValues(numHashes)}),
sh AS (
  SELECT doc_id, sid,
    CASE WHEN len(t) >= $shingleWords
      THEN array_to_string(t[sid:sid+$n1], ' ')
      ELSE array_to_string(t, ' ') END AS s
  FROM $srcCte, unnest(range(1, greatest(len(t) - $n1, 1) + 1)) AS u(sid)
  WHERE len(t) > 0),
fnv AS (
  WITH RECURSIVE f(doc_id, sid, s, pos, h) AS (
    SELECT doc_id, sid, s, 0, CAST($FnvInit AS UBIGINT) FROM sh
    UNION ALL
    SELECT doc_id, sid, s, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(s[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(s))
  SELECT doc_id, sid, h FROM f WHERE pos = len(s)),
mixed AS (
  SELECT doc_id, m.i,
    min(CASE WHEN mv >= 9223372036854775808 THEN CAST(mv - $P64 AS BIGINT)
             ELSE CAST(mv AS BIGINT) END) AS comp
  FROM (
    SELECT doc_id, i,
      (CAST(h AS HUGEINT) * alo
        + (h % 4294967296) * ahi % 4294967296 * 4294967296
        + bu) % $P64 AS mv
    FROM fnv, mixers) AS m(doc_id, i, mv)
  GROUP BY doc_id, m.i),
sig AS (SELECT doc_id, list(comp ORDER BY i) AS sig FROM mixed GROUP BY doc_id),
banded AS (
  SELECT doc_id, band, sig, sig[band*$r+1 : band*$r+$r] AS bh
  FROM sig, unnest(range(0, $bands)) AS u(band)),
keep AS (
  SELECT band, bh FROM banded GROUP BY band, bh
  HAVING COUNT(*) > 1 AND COUNT(*) <= $maxBucketSize),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
    a.sig AS sig_a, c.sig AS sig_b
  FROM (SELECT * FROM banded SEMI JOIN keep USING (band, bh)) a
  JOIN (SELECT * FROM banded SEMI JOIN keep USING (band, bh)) c
    USING (band, bh)
  WHERE a.doc_id < c.doc_id),
sets AS (
  SELECT doc_id, list_distinct(list(s)) AS ss FROM sh GROUP BY doc_id)"""
  }

  private def estExpr = "CAST(len(list_filter(list_zip(sig_a, sig_b), " +
    "p -> p[1] = p[2])) AS DOUBLE) / len(sig_a)"

  private def jaccardExpr = """CASE WHEN len(list_distinct(sa.ss || sb.ss)) = 0 THEN 0.0
      ELSE CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
        / len(list_distinct(sa.ss || sb.ss)) END"""

  /** d08: Dedup.minhashNearDups(documents) — (id_a, id_b, est_jaccard,
    * jaccard), prefilter est >= 0.6·threshold, verify >= threshold.
    */
  def minhashNearDups(shingleWords: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.7,
                      maxBucketSize: Int = 1000): String = {
    val pre = threshold * 0.6
    s"""WITH toksrc(doc_id, t) AS (
  SELECT doc_id, ${toksExpr("text")} FROM documents),
${lshCtes("toksrc", shingleWords, numHashes, bands, maxBucketSize)},
est AS (
  SELECT id_a, id_b, $estExpr AS est_jaccard FROM cand),
pre AS (SELECT * FROM est WHERE est_jaccard >= $pre)
SELECT id_a, id_b, est_jaccard, $jaccardExpr AS jaccard
FROM pre JOIN sets sa ON pre.id_a = sa.doc_id
         JOIN sets sb ON pre.id_b = sb.doc_id
WHERE $jaccardExpr >= $threshold
ORDER BY id_a, id_b"""
  }

  /** d19: GopherStats counters + derived fractions + threshold verdict
    * — (doc_id, word_count, stopword_hits, 7 rounded fractions,
    * gopher_pass). The counters are integers on both sides, so the
    * fractions (single division + round(…,4)) are bit-comparable.
    */
  /** d25: Dsir.score(documents, documents WHERE lang = targetLang) —
    * hashed-unigram importance weights. The token FNV-1a64 (the
    * two-round-per-char `Sketch.fnv1a64` family, same chain as the
    * minhash shingle oracle) is computed once per DISTINCT token and
    * joined back; buckets are the hash's low bits (numBuckets is a
    * power of two, so unsigned `% numBuckets` equals the kernel's
    * signed `& (numBuckets-1)`). Log-weights snap to a 9-dp grid and
    * per-doc sums run in exact DECIMAL — order-independent on both
    * engines.
    */
  def dsirScore(numBuckets: Int = 4096, targetLang: String = "en"): String = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0)
    s"""WITH toksrc AS (
  SELECT doc_id, lang, ${toksExpr("text")} AS t FROM documents),
tok AS (SELECT doc_id, lang, u.tok FROM toksrc, unnest(t) AS u(tok)),
toku AS (SELECT DISTINCT tok FROM tok),
fnv AS (
  WITH RECURSIVE f(tok, pos, h) AS (
    SELECT tok, 0, CAST($FnvInit AS UBIGINT) FROM toku
    UNION ALL
    SELECT tok, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(tok[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(tok))
  SELECT tok, CAST(h % $numBuckets AS BIGINT) AS bucket
  FROM f WHERE pos = len(tok)),
tb AS (SELECT doc_id, lang, bucket FROM tok JOIN fnv USING (tok)),
raw AS (SELECT bucket, COUNT(*) AS r FROM tb GROUP BY bucket),
tgt AS (SELECT bucket, COUNT(*) AS t FROM tb
        WHERE lang = '$targetLang' GROUP BY bucket),
tot AS (SELECT (SELECT COUNT(*) FROM tb) AS rr,
               (SELECT COUNT(*) FROM tb WHERE lang = '$targetLang') AS tt),
w AS (
  SELECT bucket,
    ln(CAST(COALESCE(t, 0) + 1 AS DOUBLE) / CAST(tt + $numBuckets AS DOUBLE))
      - ln(CAST(r + 1 AS DOUBLE) / CAST(rr + $numBuckets AS DOUBLE)) AS weight
  FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot),
n AS (SELECT doc_id, bucket, COUNT(*) AS n FROM tb GROUP BY doc_id, bucket),
sc AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks,
    CAST(SUM(n * CAST(round(weight, 9) AS DECIMAL(18,9))) AS DOUBLE)
      AS dsir_score
  FROM n JOIN w USING (bucket) GROUP BY doc_id)
SELECT d.doc_id, COALESCE(sc.n_toks, 0) AS n_toks,
  COALESCE(sc.dsir_score, 0.0) AS dsir_score
FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"""
  }

  /** d33: NaiveBayes.classify — the same token-FNV bucket family as
    * d25, one count table per (class, bucket), ln snapped to the 9-dp
    * grid, per-(doc, class) scores accumulated in exact DECIMAL, and
    * the argmax broken by label order. The per-class smoothing
    * constant is factored out (`− n_d · ln(tok_c + B)`), so unseen
    * (class, bucket) pairs contribute exactly 0 in both engines.
    */
  def naiveBayes(numBuckets: Int = 4096, trainMod: Int = 10,
                 trainBelow: Int = 8): String = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0)
    s"""WITH toksrc AS (
  SELECT doc_id, lang, ${toksExpr("text")} AS t FROM documents),
tok AS (SELECT doc_id, lang, u.tok FROM toksrc, unnest(t) AS u(tok)),
toku AS (SELECT DISTINCT tok FROM tok),
fnv AS (
  WITH RECURSIVE f(tok, pos, h) AS (
    SELECT tok, 0, CAST($FnvInit AS UBIGINT) FROM toku
    UNION ALL
    SELECT tok, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(tok[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(tok))
  SELECT tok, CAST(h % $numBuckets AS BIGINT) AS bucket
  FROM f WHERE pos = len(tok)),
tb AS (SELECT doc_id, lang, bucket FROM tok JOIN fnv USING (tok)),
trn AS (SELECT * FROM tb WHERE doc_id % $trainMod < $trainBelow),
w AS (
  SELECT lang AS label, bucket,
    CAST(round(ln(CAST(COUNT(*) + 1 AS DOUBLE)), 9) AS DECIMAL(18,9)) AS w
  FROM trn GROUP BY lang, bucket),
dtot AS (SELECT COUNT(*) AS n FROM documents
         WHERE doc_id % $trainMod < $trainBelow),
cstat AS (
  SELECT d.lang AS label,
    CAST(round(ln(CAST(COUNT(*) AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM dtot)), 9)
      AS DECIMAL(18,9)) AS prior,
    CAST(round(ln(CAST(COALESCE(tc.n, 0) + $numBuckets AS DOUBLE)), 9)
      AS DECIMAL(18,9)) AS lnorm
  FROM documents d
  LEFT JOIN (SELECT lang, COUNT(*) AS n FROM trn GROUP BY lang) tc
    ON tc.lang = d.lang
  WHERE d.doc_id % $trainMod < $trainBelow
  GROUP BY d.lang, tc.n),
nb AS (SELECT doc_id, bucket, COUNT(*) AS n FROM tb GROUP BY doc_id, bucket),
nd AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_toks FROM nb GROUP BY doc_id),
sdc AS (
  SELECT doc_id, label, SUM(CAST(n AS DECIMAL(10,0)) * w.w) AS s
  FROM nb JOIN w USING (bucket) GROUP BY doc_id, label),
grid AS (
  SELECT d.doc_id, d.lang AS actual, COALESCE(nd.n_toks, 0) AS n_toks,
    c.label,
    c.prior + COALESCE(sdc.s, 0)
      - CAST(COALESCE(nd.n_toks, 0) AS DECIMAL(10,0)) * c.lnorm AS score
  FROM documents d
  LEFT JOIN nd USING (doc_id)
  CROSS JOIN cstat c
  LEFT JOIN sdc ON sdc.doc_id = d.doc_id AND sdc.label = c.label),
pred AS (
  SELECT doc_id, actual, n_toks, label, score,
    ROW_NUMBER() OVER (PARTITION BY doc_id
      ORDER BY score DESC, label) AS rk
  FROM grid)
SELECT doc_id, n_toks, actual, label AS predicted,
  actual = label AS correct,
  doc_id % $trainMod < $trainBelow AS is_train,
  CAST(score AS DOUBLE) AS score
FROM pred WHERE rk = 1 ORDER BY doc_id"""
  }

  /** d26: Bm25.search — the same integer tf/df/dl tables and the same
    * double formula, operand-for-operand (derived constants like k1+1
    * are interpolated via Double.toString, which round-trips exactly);
    * per-term scores snap to a 9-dp grid and sum in DECIMAL.
    */
  def bm25(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topN: Int = 20): String = {
    val termList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${toksExpr("text")} AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
st AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
tf AS (
  SELECT doc_id, u.tok, COUNT(*) AS tf
  FROM t, unnest(toks) AS u(tok)
  WHERE u.tok IN ($termList)
  GROUP BY doc_id, u.tok),
dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
sc AS (
  SELECT doc_id,
    round(
      ln(1.0 + (CAST(nn - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
      * ((CAST(tf AS DOUBLE) * ${k1 + 1.0})
        / (CAST(tf AS DOUBLE)
          + $k1 * (1.0 - $b + ($b * CAST(dl AS DOUBLE))
            / (CAST(tt AS DOUBLE) / nn)))), 9) AS ts
  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN st),
agg AS (
  SELECT doc_id, COUNT(*) AS matched_terms,
    SUM(CAST(ts AS DECIMAL(18,9))) AS s
  FROM sc GROUP BY doc_id)
SELECT doc_id, CAST(matched_terms AS BIGINT) AS matched_terms,
  CAST(s AS DOUBLE) AS score
FROM agg ORDER BY s DESC, doc_id LIMIT $topN"""
  }

  /** d29: Dsir.gumbelTopK over the d25 scores — the md5-derived
    * 52-bit uniform, the double Gumbel transform (libm ln on both
    * engines), and the top-k all re-derived in SQL. Digit folding
    * stays exact: every partial product is an integer below 2^53.
    */
  def dsirResample(numBuckets: Int = 4096, targetLang: String = "en",
                   k: Int = 100, tau: Double = 1.0): String = {
    s"""WITH base AS (SELECT * FROM (${dsirScore(numBuckets, targetLang)})),
hx AS (
  SELECT doc_id, dsir_score,
    substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS m
  FROM base),
hv AS (
  SELECT doc_id, any_value(dsir_score) AS dsir_score,
    SUM((strpos('0123456789abcdef', substr(m, CAST(i AS INTEGER) + 1, 1)) - 1)
      * power(16, CAST(12 - i AS INTEGER))) AS h
  FROM hx, unnest(range(13)) AS u(i)
  GROUP BY doc_id),
ky AS (
  SELECT doc_id, dsir_score,
    dsir_score / $tau + (-ln(-ln((h + 0.5) / 4503599627370496.0)))
      AS gumbel_key
  FROM hv)
SELECT doc_id, dsir_score, gumbel_key FROM ky
ORDER BY gumbel_key DESC, doc_id LIMIT $k"""
  }

  /** d30: NgramLm.crossEntropy — bigrams re-assembled positionally,
    * the same FNV chain over the DISTINCT bigram/unigram strings, and
    * the same 9-dp-grid / exact-DECIMAL / libm-ln discipline as d25.
    */
  def bigramCrossEntropy(numBuckets: Int = 4096): String = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0)
    s"""WITH toksrc AS (
  SELECT doc_id, ${toksExpr("text")} AS t FROM documents),
tok AS (SELECT doc_id, u.tok FROM toksrc, unnest(t) AS u(tok)),
big AS (
  SELECT doc_id, t[sid] || ' ' || t[sid+1] AS bg, t[sid] AS w1
  FROM toksrc, unnest(range(1, len(t))) AS u(sid)
  WHERE len(t) >= 2),
strs AS (
  SELECT DISTINCT s FROM (
    SELECT bg AS s FROM big UNION ALL SELECT tok FROM tok)),
fnv AS (
  WITH RECURSIVE f(s, pos, h) AS (
    SELECT s, 0, CAST($FnvInit AS UBIGINT) FROM strs
    UNION ALL
    SELECT s, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(s[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(s))
  SELECT s, CAST(h % $numBuckets AS BIGINT) AS bucket
  FROM f WHERE pos = len(s)),
c2 AS (SELECT f.bucket AS b2, COUNT(*) AS c2
       FROM big JOIN fnv f ON big.bg = f.s GROUP BY f.bucket),
c1 AS (SELECT f.bucket AS b1, COUNT(*) AS c1
       FROM tok JOIN fnv f ON tok.tok = f.s GROUP BY f.bucket),
occ AS (
  SELECT big.doc_id, f1.bucket AS bb, f2.bucket AS ub
  FROM big JOIN fnv f1 ON big.bg = f1.s JOIN fnv f2 ON big.w1 = f2.s),
n AS (SELECT doc_id, bb, ub, COUNT(*) AS n FROM occ GROUP BY doc_id, bb, ub),
sc AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
    CAST(SUM(n * CAST(round(
      ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + $numBuckets AS DOUBLE)), 9)
      AS DECIMAL(18,9))) AS DOUBLE) AS s
  FROM n JOIN c2 ON bb = b2 JOIN c1 ON ub = b1 GROUP BY doc_id)
SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
  CASE WHEN COALESCE(sc.n_bigrams, 0) = 0 THEN 0.0
       ELSE -(s / sc.n_bigrams) END AS cross_entropy
FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"""
  }

  /** d31: RepeatedSpans.spans — shingle positions re-derived 1-based
    * and emitted 0-based to match posexplode; the same FNV chain over
    * distinct shingle strings; gaps-and-islands via the sid −
    * row_number trick on both engines.
    */
  def repeatedSpans(spanTokens: Int = 8, maxDocs: Int = 1): String = {
    val k = spanTokens
    s"""WITH toksrc AS (
  SELECT doc_id, ${toksExpr("text")} AS t FROM documents),
sh AS (
  SELECT doc_id, sid, array_to_string(t[sid:sid+${k - 1}], ' ') AS s
  FROM toksrc, unnest(range(1, len(t) - ${k - 1} + 1)) AS u(sid)
  WHERE len(t) >= $k),
strs AS (SELECT DISTINCT s FROM sh),
fnv AS (
  WITH RECURSIVE f(s, pos, h) AS (
    SELECT s, 0, CAST($FnvInit AS UBIGINT) FROM strs
    UNION ALL
    SELECT s, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(s[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(s))
  SELECT s, h FROM f WHERE pos = len(s)),
occ AS (SELECT sh.doc_id, sh.sid, f.h FROM sh JOIN fnv f USING (s)),
rep AS (SELECT h FROM occ GROUP BY h
        HAVING COUNT(DISTINCT doc_id) > $maxDocs),
mk AS (SELECT doc_id, sid FROM occ SEMI JOIN rep USING (h)),
isl AS (
  SELECT doc_id, sid,
    sid - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sid) AS grp
  FROM mk),
sp AS (
  SELECT doc_id, grp, MIN(sid) - 1 AS start_tok,
    MAX(sid) - 1 + ${k - 1} AS end_tok, COUNT(*) AS n_shingles
  FROM isl GROUP BY doc_id, grp)
SELECT doc_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_tok) AS BIGINT)
    AS span_idx,
  CAST(start_tok AS BIGINT) AS start_tok,
  CAST(end_tok AS BIGINT) AS end_tok,
  CAST(n_shingles AS BIGINT) AS n_shingles
FROM sp ORDER BY doc_id, span_idx"""
  }

  def gopherStats(): String = {
    val bigrams = "list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])"
    s"""WITH f AS (
  SELECT doc_id, ${toksExpr("text")} AS t,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
      x -> len(x) > 0) AS ll
  FROM documents),
g AS (
  SELECT doc_id,
    len(t) AS word_count,
    COALESCE(CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT), 0) AS token_chars,
    len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS alpha_words,
    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
      sw -> list_contains(t, sw))) AS BIGINT) AS stopword_hits,
    COALESCE(list_max(list_transform(list_distinct($bigrams),
      b -> CAST(len(list_filter($bigrams, x -> x = b)) * (len(b) - 1) AS BIGINT))),
      0) AS top_bigram_chars,
    len(ll) AS n_lines,
    len(list_filter(ll, x -> x[1] IN ('-', '*'))) AS bullet_lines,
    len(list_filter(ll, x -> ends_with(x, '...'))) AS ellipsis_lines,
    len(list_distinct(ll)) AS distinct_lines,
    COALESCE(CAST(list_sum(list_transform(ll, x -> len(x))) AS BIGINT), 0) AS line_chars,
    COALESCE(CAST(list_sum(list_transform(ll, x -> len(x))) AS BIGINT), 0)
      - COALESCE(CAST(list_sum(list_transform(list_distinct(ll), x -> len(x))) AS BIGINT),
        0) AS dup_line_chars
  FROM f),
m AS (
  SELECT doc_id, word_count, stopword_hits,
    CASE WHEN word_count = 0 THEN 0.0
      ELSE round(CAST(token_chars AS DOUBLE) / word_count, 4) END AS mean_word_len,
    CASE WHEN word_count = 0 THEN 0.0
      ELSE round(CAST(alpha_words AS DOUBLE) / word_count, 4) END AS alpha_frac,
    CASE WHEN token_chars = 0 THEN 0.0
      ELSE round(CAST(top_bigram_chars AS DOUBLE) / token_chars, 4) END AS top_bigram_frac,
    CASE WHEN n_lines = 0 THEN 0.0
      ELSE round(1.0 - CAST(distinct_lines AS DOUBLE) / n_lines, 4) END AS dup_line_frac,
    CASE WHEN line_chars = 0 THEN 0.0
      ELSE round(CAST(dup_line_chars AS DOUBLE) / line_chars, 4) END AS dup_line_char_frac,
    CASE WHEN n_lines = 0 THEN 0.0
      ELSE round(CAST(bullet_lines AS DOUBLE) / n_lines, 4) END AS bullet_frac,
    CASE WHEN n_lines = 0 THEN 0.0
      ELSE round(CAST(ellipsis_lines AS DOUBLE) / n_lines, 4) END AS ellipsis_frac
  FROM g)
SELECT *,
  (word_count BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
    AND alpha_frac >= 0.8 AND stopword_hits >= 2 AND top_bigram_frac <= 0.2
    AND dup_line_frac <= 0.3 AND dup_line_char_frac <= 0.2
    AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3 AS gopher_pass
FROM m ORDER BY doc_id"""
  }

  /** d18: ConnectedComponents.clusters over Dedup.minhashNearDups
    * pairs — (doc_id, cluster_id, cluster_size). The pair generation is
    * the same bit-exact signature family as d08; clustering is
    * transitive closure via a recursive CTE (min reachable id = the
    * fixpoint the Spark-side label propagation converges to).
    */
  def nearDupClusters(shingleWords: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, threshold: Double = 0.7,
                      maxBucketSize: Int = 1000): String = {
    val pre = threshold * 0.6
    s"""WITH toksrc(doc_id, t) AS (
  SELECT doc_id, ${toksExpr("text")} FROM documents),
${lshCtes("toksrc", shingleWords, numHashes, bands, maxBucketSize)},
est AS (
  SELECT id_a, id_b, $estExpr AS est_jaccard FROM cand),
pre AS (SELECT * FROM est WHERE est_jaccard >= $pre),
pairs AS (
  SELECT id_a, id_b
  FROM pre JOIN sets sa ON pre.id_a = sa.doc_id
           JOIN sets sb ON pre.id_b = sb.doc_id
  WHERE $jaccardExpr >= $threshold),
comp AS (
  WITH RECURSIVE
  nodes AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
  edges AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
  reach(id, r) AS (
    SELECT id, id FROM nodes
    UNION
    SELECT e.b, reach.r FROM edges e JOIN reach ON reach.id = e.a)
  SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT id AS doc_id, component AS cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
FROM comp ORDER BY doc_id"""
  }

  /** d09: Dedup.simhashNearDups(documents) — (id_a, id_b, hamming).
    * Token hash is ONE FNV round per (ASCII) byte; the fingerprint is
    * the bit-vote sign vector; banding joins on 16-bit chunks.
    */
  def simhashNearDups(bands: Int = 4, maxHamming: Int = 3,
                      maxBucketSize: Int = 1000): String = {
    val bits = 64 / bands
    val chunkMask = (1L << bits) - 1
    s"""WITH toksrc AS (
  SELECT doc_id, ${toksExpr("text")} AS t FROM documents),
tok AS (
  SELECT doc_id, u.tok, COUNT(*) AS cnt
  FROM toksrc, unnest(t) AS u(tok)
  GROUP BY doc_id, u.tok),
toku AS (SELECT DISTINCT tok FROM tok),
fnv AS (
  WITH RECURSIVE f(tok, pos, h) AS (
    SELECT tok, 0, CAST($FnvInit AS UBIGINT) FROM toku
    UNION ALL
    SELECT tok, pos + 1,
      CAST(CAST(xor(h, CAST(ascii(tok[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT)
      FROM f WHERE pos < len(tok))
  SELECT tok, h FROM f WHERE pos = len(tok)),
votes AS (
  SELECT t.doc_id, u.b,
    SUM(CASE WHEN (fnv.h >> u.b) & 1 = 1 THEN t.cnt ELSE -t.cnt END) AS v
  FROM tok t JOIN fnv USING (tok), unnest(range(0, 64)) AS u(b)
  GROUP BY t.doc_id, u.b),
fp AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN v > 0 THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
             ELSE 0 END) AS UBIGINT) AS f
  FROM votes GROUP BY doc_id),
banded AS (
  SELECT doc_id, f, band, (f >> CAST(band*$bits AS UBIGINT)) & $chunkMask AS chunk
  FROM fp, unnest(range(0, $bands)) AS u(band)),
keep AS (
  SELECT band, chunk FROM banded GROUP BY band, chunk
  HAVING COUNT(*) > 1 AND COUNT(*) <= $maxBucketSize),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b, a.f AS fa, c.f AS fb
  FROM (SELECT * FROM banded SEMI JOIN keep USING (band, chunk)) a
  JOIN (SELECT * FROM banded SEMI JOIN keep USING (band, chunk)) c
    USING (band, chunk)
  WHERE a.doc_id < c.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(fa, fb)) <= $maxHamming
ORDER BY id_a, id_b"""
  }

  /** (p, plane-vector) literal rows for the seeded SRP hyperplanes.
    * Double.toString round-trips exactly, and DuckDB parses decimal
    * literals to the nearest double — the SQL-side planes are
    * bit-identical to the kernel's.
    */
  private def planesValues(numPlanes: Int, dim: Int): String = {
    val planes = graft.functions.VectorKernels.srpPlanes(numPlanes, dim)
    planes.zipWithIndex.map { case (v, p) =>
      s"($p, CAST([${v.mkString(",")}] AS DOUBLE[]))"
    }.mkString(",")
  }

  /** SRP bucket as SQL: packed sign bits of the plane dot products.
    * `list_dot_product` is a sequential left fold in double precision —
    * the same accumulation order as the SrpBucket kernel.
    */
  private def srpBucketCte(name: String, src: String, idAlias: String,
                           numPlanes: Int): String =
    s"""$name AS (
  SELECT vec_id AS $idAlias, dv,
    CAST(SUM(CASE WHEN list_dot_product(dv, pv) > 0.0
      THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT) AS bucket
  FROM $src, planes GROUP BY vec_id, dv)"""

  /** e02: Similarity.srpTopK(queries=vec_id<10, corpus, k, numPlanes)
    * with 1-bit multiprobe — (query_id, neighbor_id, cosine, rank).
    */
  def srpTopK(k: Int, numPlanes: Int, dim: Int): String =
    s"""WITH planes(p, pv) AS (VALUES ${planesValues(numPlanes, dim)}),
c0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
${srpBucketCte("cb", "c0", "neighbor_id", numPlanes)},
q0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings
       WHERE vec_id < 10),
${srpBucketCte("qb", "q0", "query_id", numPlanes)},
probes AS (
  SELECT query_id, dv AS qv, bucket FROM qb
  UNION ALL
  SELECT query_id, dv, xor(bucket, CAST(1 AS BIGINT) << b.b)
  FROM qb, unnest(range(0, $numPlanes)) AS b(b)),
scored AS (
  SELECT DISTINCT query_id, neighbor_id,
    list_cosine_similarity(qv, cb.dv) AS cos_raw
  FROM cb JOIN probes USING (bucket)
  WHERE query_id <> neighbor_id),
r AS (
  SELECT query_id, neighbor_id, cos_raw,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
  CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= $k ORDER BY query_id, rank"""

  /** e04: Similarity.embeddingNearDups — same-bucket pairs with
    * cosine >= threshold, bucket-size guard included.
    */
  def embeddingNearDups(threshold: Double, numPlanes: Int, dim: Int,
                        maxBucketSize: Int = 1000): String =
    s"""WITH planes(p, pv) AS (VALUES ${planesValues(numPlanes, dim)}),
v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
${srpBucketCte("vb", "v0", "vec_id", numPlanes)},
keep AS (
  SELECT bucket FROM vb GROUP BY bucket
  HAVING COUNT(*) > 1 AND COUNT(*) <= $maxBucketSize),
pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b,
    list_cosine_similarity(a.dv, c.dv) AS cos_raw
  FROM (SELECT * FROM vb SEMI JOIN keep USING (bucket)) a
  JOIN (SELECT * FROM vb SEMI JOIN keep USING (bucket)) c USING (bucket)
  WHERE a.vec_id < c.vec_id)
SELECT DISTINCT id_a, id_b, ROUND(cos_raw, 6) AS cosine
FROM pairs WHERE cos_raw >= $threshold
ORDER BY id_a, id_b"""

  // ── xxhash64 (Spark's hash family, fixed 8-byte input) ─────────────

  /** `x * c mod 2^64` for a full 64-bit constant: decomposed into
    * HUGEINT-safe partial products (x·cLo ≤ 2^96; the cHi product is
    * reduced mod 2^32 before the shift).
    */
  private def umulSql(x: String, c: BigInt): String = {
    val lo = c & 0xffffffffL
    val hi = c >> 32
    s"CAST((CAST($x AS HUGEINT) * $lo + (($x) % 4294967296) * $hi " +
      s"% 4294967296 * 4294967296) % $P64 AS UBIGINT)"
  }

  private def rotlSql(x: String, r: Int): String =
    s"CAST((($x) % ${BigInt(1) << (64 - r)}) * ${BigInt(1) << r} " +
      s"+ (($x) >> ${64 - r}) AS UBIGINT)"

  private val XxP1 = BigInt("9E3779B185EBCA87", 16)
  private val XxP2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val XxP3 = BigInt("165667B19E3779F9", 16)
  private val XxP4 = BigInt("85EBCA77C2B2AE63", 16)
  private val XxP5 = BigInt("27D4EB2F165667C5", 16)

  /** CTE chain `x0..xh(vec_id, dv, h)`: Spark's xxhash64(vec_id)
    * (seed 42, single 8-byte round + avalanche) as signed BIGINT,
    * carrying the double-cast embedding alongside.
    */
  private def xxhash64Ctes(seed: Long): String = {
    val init = (BigInt(seed) + XxP5 + 8) & ((BigInt(1) << 64) - 1)
    s"""x0 AS (SELECT vec_id, CAST(CAST(vec_id AS HUGEINT) % $P64
  + CASE WHEN vec_id < 0 THEN $P64 ELSE 0 END AS UBIGINT) AS l,
  CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
x1 AS (SELECT vec_id, dv, ${umulSql("l", XxP2)} AS k FROM x0),
x2 AS (SELECT vec_id, dv, ${rotlSql("k", 31)} AS k FROM x1),
x3 AS (SELECT vec_id, dv, ${umulSql("k", XxP1)} AS k FROM x2),
x4 AS (SELECT vec_id, dv, xor(CAST($init AS UBIGINT), k) AS h FROM x3),
x5 AS (SELECT vec_id, dv, ${rotlSql("h", 27)} AS h FROM x4),
x6 AS (SELECT vec_id, dv, CAST((CAST(${umulSql("h", XxP1)} AS HUGEINT) + $XxP4)
  % $P64 AS UBIGINT) AS h FROM x5),
x7 AS (SELECT vec_id, dv, xor(h, h >> 33) AS h FROM x6),
x8 AS (SELECT vec_id, dv, ${umulSql("h", XxP2)} AS h FROM x7),
x9 AS (SELECT vec_id, dv, xor(h, h >> 29) AS h FROM x8),
xa AS (SELECT vec_id, dv, ${umulSql("h", XxP3)} AS h FROM x9),
xh AS (SELECT vec_id, dv,
  CASE WHEN xor(h, h >> 32) >= 9223372036854775808
    THEN CAST(xor(h, h >> 32) - $P64 AS BIGINT)
    ELSE CAST(xor(h, h >> 32) AS BIGINT) END AS h FROM xa)"""
  }

  /** Nearest-centroid assignment of `corpus(vec_id, dv)` against
    * `$cents(cell_id, centroid)` — argmax cosine, ties to the smallest
    * cell_id (IvfAnn.assign order).
    */
  private def assignCte(name: String, cents: String): String =
    s"""$name AS (
  SELECT vec_id, dv, cell_id FROM (
    SELECT c.vec_id, c.dv, s.cell_id,
      ROW_NUMBER() OVER (PARTITION BY c.vec_id
        ORDER BY list_cosine_similarity(c.dv, s.centroid) DESC, s.cell_id) AS rn
    FROM corpus c CROSS JOIN $cents s) WHERE rn = 1)"""

  /** e05: IvfAnn.topK — deterministic xxhash64 seeding, `iterations`
    * Lloyd passes with exact-decimal means, nProbe cell probing, exact
    * cosine within probed cells.
    */
  def ivfTopK(k: Int, nCells: Int, nProbe: Int,
              iterations: Int): String = {
    val lloyd = (1 to iterations).map { it =>
      val prev = if (it == 1) "seeds" else s"cents${it - 1}"
      s"""${assignCte(s"assign$it", prev)},
cents$it AS (
  SELECT cell_id, list(m ORDER BY dim) AS centroid FROM (
    SELECT cell_id, dim,
      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
    FROM (SELECT cell_id, unnest(dv) AS v,
          unnest(range(len(dv))) AS dim FROM assign$it)
    GROUP BY cell_id, dim)
  GROUP BY cell_id)"""
    }.mkString(",\n")
    val cents = s"cents$iterations"
    s"""WITH ${xxhash64Ctes(42L)},
seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS INTEGER) AS cell_id,
    dv AS centroid
  FROM (SELECT * FROM xh ORDER BY h LIMIT $nCells)),
corpus AS (SELECT vec_id, dv FROM xh),
$lloyd,
${assignCte("idxa", cents)},
idx AS (SELECT vec_id AS neighbor_id, dv AS cv, cell_id FROM idxa),
probes AS (
  SELECT query_id, qv, cell_id FROM (
    SELECT q.vec_id AS query_id, q.dv AS qv, s.cell_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        ORDER BY list_cosine_similarity(q.dv, s.centroid) DESC, s.cell_id) AS rn
    FROM (SELECT * FROM corpus WHERE vec_id < 10) q CROSS JOIN $cents s)
  WHERE rn <= $nProbe),
scored AS (
  SELECT DISTINCT query_id, neighbor_id,
    list_cosine_similarity(qv, cv) AS cos_raw
  FROM idx JOIN probes USING (cell_id)
  WHERE query_id <> neighbor_id),
r AS (
  SELECT query_id, neighbor_id, cos_raw,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
  CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** e10: Quantization.topKInt8 — per-vector absmax int8 codes (the
    * same explicit floor/ceil half-away-from-zero rounding as the
    * kernel), then cosine over the EXACT integer codes: dot and the
    * two squared norms are integers represented exactly in double, so
    * `dot / (sqrt(na) * sqrt(nb))` is the identical IEEE op sequence
    * in both engines — no summation-order concern at all.
    */
  def int8TopK(k: Int): String =
    s"""WITH src AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale, v
  FROM src),
codes AS (
  SELECT vec_id,
    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
         ELSE list_transform(v, x -> GREATEST(-127.0, LEAST(127.0,
           CASE WHEN x / scale >= 0 THEN floor(x / scale + 0.5)
                ELSE ceil(x / scale - 0.5) END))) END AS qv
  FROM qz),
q AS (SELECT vec_id AS query_id, qv AS qa FROM codes WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, qv AS qb FROM codes),
s AS (
  SELECT query_id, neighbor_id,
    list_dot_product(qa, qb) AS dot,
    sqrt(list_dot_product(qa, qa)) * sqrt(list_dot_product(qb, qb)) AS nn
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (
  SELECT query_id, neighbor_id,
    CASE WHEN nn = 0 THEN 0.0 ELSE dot / nn END AS cos_raw
  FROM s),
rk AS (
  SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM r)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= $k ORDER BY query_id, rank"""

  /** e09: Similarity.recallAtK(srpTopK, bruteTopK) — both searches
    * re-derived in SQL (the SRP side reuses the e02 oracle verbatim
    * as a subquery), then recall = |approx ∩ exact| / |exact| per
    * query. Exact integer ratio → correctly-rounded double division
    * on both engines.
    */
  def annRecall(k: Int, numPlanes: Int, dim: Int, nCells: Int,
                nProbe: Int, iterations: Int): String = {
    def one(method: String, apxSql: String): String =
      s"""SELECT '$method' AS method, t.query_id,
  CAST(COALESCE(h.hits, 0) AS DOUBLE) / t.total AS recall
FROM (SELECT query_id, COUNT(*) AS total FROM ext GROUP BY query_id) t
LEFT JOIN (
  SELECT query_id, COUNT(*) AS hits
  FROM (SELECT * FROM ext SEMI JOIN
    (SELECT query_id, neighbor_id FROM ($apxSql)) AS apx
    USING (query_id, neighbor_id))
  GROUP BY query_id) h USING (query_id)"""
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
ext AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
    FROM q CROSS JOIN c WHERE query_id <> neighbor_id)
  WHERE rank <= $k)
${one("srp", srpTopK(k, numPlanes, dim))}
UNION ALL
${one("ivf", ivfTopK(k, nCells, nProbe, iterations))}
ORDER BY method, query_id"""
  }

  /** e08: SemDedup.verdicts — the same deterministic Lloyd build as
    * e05 (xxhash64 seeding, exact-decimal means), then within-cell
    * pairs above the cosine threshold mark the larger id dropped.
    * The cell-size guard mirrors the kernel's: singleton and
    * oversized cells pair nothing.
    *
    * `nCells <= 0` replays the kernel's auto-k rule IN SQL
    * (`SemDedup.chooseK`: k = max(16, ceil(N / targetCellSize))) — the
    * seed count becomes a scalar computed from the corpus, so the gated
    * path is the linear-at-scale path at every SF without the oracle
    * and the operator ever disagreeing on k.
    */
  def semanticDedup(threshold: Double, nCells: Int, iterations: Int,
                    maxCellSize: Int, targetCellSize: Int = 2048): String = {
    val lloyd = (1 to iterations).map { it =>
      val prev = if (it == 1) "seeds" else s"cents${it - 1}"
      s"""${assignCte(s"assign$it", prev)},
cents$it AS (
  SELECT cell_id, list(m ORDER BY dim) AS centroid FROM (
    SELECT cell_id, dim,
      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS m
    FROM (SELECT cell_id, unnest(dv) AS v,
          unnest(range(len(dv))) AS dim FROM assign$it)
    GROUP BY cell_id, dim)
  GROUP BY cell_id)"""
    }.mkString(",\n")
    val seeds =
      if (nCells > 0)
        s"""seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS INTEGER) AS cell_id,
    dv AS centroid
  FROM (SELECT * FROM xh ORDER BY h LIMIT $nCells))"""
      else
        // SemDedup.chooseK in SQL: integer-exact for N < 2^53
        s"""kk AS (
  SELECT GREATEST(16, CAST(CEIL(COUNT(*) / $targetCellSize.0) AS INTEGER)) AS k
  FROM xh),
seeds AS (
  SELECT CAST(rn - 1 AS INTEGER) AS cell_id, dv AS centroid
  FROM (SELECT dv, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM xh) s, kk
  WHERE s.rn <= kk.k)"""
    s"""WITH ${xxhash64Ctes(42L)},
$seeds,
corpus AS (SELECT vec_id, dv FROM xh),
$lloyd,
${assignCte("cells", s"cents$iterations")},
pairable AS (
  SELECT cell_id FROM cells GROUP BY cell_id
  HAVING COUNT(*) > 1 AND COUNT(*) <= $maxCellSize),
dropped AS (
  SELECT DISTINCT b.vec_id AS id_b
  FROM (SELECT * FROM cells SEMI JOIN pairable USING (cell_id)) a
  JOIN (SELECT * FROM cells SEMI JOIN pairable USING (cell_id)) b
    USING (cell_id)
  WHERE a.vec_id < b.vec_id
    AND list_cosine_similarity(a.dv, b.dv) >= $threshold)
SELECT c.vec_id, c.cell_id, d.id_b IS NULL AS kept
FROM cells c LEFT JOIN dropped d ON c.vec_id = d.id_b
ORDER BY c.vec_id"""
  }

  /** e07: PqAnn.topK — product quantization with the same xxhash64
    * seeding family as IVF (the ksub seed VECTORS, sliced per
    * subspace), per-subspace Lloyd with exact-decimal means, squared-
    * L2 assignment in the literal `dot(s,s)+dot(c,c)-2·dot(s,c)` form
    * (sequential-fold dots — list_dot_product order), and ADC scoring
    * whose per-subspace parts sum in m-order via a dot against a ones
    * vector (a sequential fold, matching the kernel's accumulation).
    */
  def pqTopK(k: Int, numSub: Int, subDim: Int, ksub: Int,
             iterations: Int): String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
  SELECT vec_id, m, sub, cell_id FROM (
    SELECT s.vec_id, s.m, s.sub, c.cell_id,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
        ORDER BY list_dot_product(s.sub, s.sub)
          + list_dot_product(c.centroid, c.centroid)
          - 2 * list_dot_product(s.sub, c.centroid) ASC, c.cell_id) AS rn
    FROM subs s JOIN $cents c USING (m)) WHERE rn = 1)"""
    val lloyd = (1 to iterations).map { it =>
      val prev = if (it == 1) "seeds" else s"cents${it - 1}"
      s"""${assignCte(s"passign$it", prev)},
cents$it AS (
  SELECT m, cell_id, list(mm ORDER BY dim) AS centroid FROM (
    SELECT m, cell_id, dim,
      CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS mm
    FROM (SELECT m, cell_id, unnest(sub) AS v,
          unnest(range(len(sub))) AS dim FROM passign$it)
    GROUP BY m, cell_id, dim)
  GROUP BY m, cell_id)"""
    }.mkString(",\n")
    val cents = s"cents$iterations"
    val ones = Seq.fill(numSub)("1.0").mkString(",")
    s"""WITH ${xxhash64Ctes(42L)},
seeds0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS INTEGER) AS cell_id, dv
  FROM (SELECT * FROM xh ORDER BY h LIMIT $ksub)),
seeds AS (
  SELECT u.m, cell_id,
    dv[u.m*$subDim+1 : u.m*$subDim+$subDim] AS centroid
  FROM seeds0, unnest(range(0, $numSub)) AS u(m)),
subs AS (
  SELECT vec_id, u.m, dv[u.m*$subDim+1 : u.m*$subDim+$subDim] AS sub
  FROM xh, unnest(range(0, $numSub)) AS u(m)),
$lloyd,
${assignCte("codes", cents)},
q AS (SELECT vec_id AS query_id, dv FROM xh WHERE vec_id < 10),
lut AS (
  SELECT query_id, c.m, c.cell_id,
    list_dot_product(q.dv[c.m*$subDim+1 : c.m*$subDim+$subDim], c.centroid)
      AS part
  FROM q, $cents c),
scored AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id,
    list_dot_product(list(l.part ORDER BY l.m), [$ones]) AS score
  FROM codes cd JOIN lut l ON l.m = cd.m AND l.cell_id = cd.cell_id
  WHERE l.query_id <> cd.vec_id
  GROUP BY l.query_id, cd.vec_id),
r AS (
  SELECT query_id, neighbor_id, score,
    ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, ROUND(score, 6) AS score,
  CAST(rank AS INTEGER) AS rank
FROM r WHERE rank <= $k ORDER BY query_id, rank"""
  }

  /** d06: TextFunctions.langId over documents — CJK script split
    * (hangul → ko, kana share → ja, han → zh), else argmax stopword-
    * profile hit ratio with strict-greater first-wins ties (equivalent
    * to ORDER BY score DESC, lang ASC LIMIT 1 over the sorted
    * profiles), `und` below the floor. The profile word lists are
    * inlined from TextFunctions.stopwordProfiles — single source.
    */
  def langId(floor: Double = 0.02): String = {
    val profRows = graft.functions.TextFunctions.stopwordProfiles
      .toSeq.sortBy(_._1).map { case (lang, words) =>
        s"('$lang', [${words.map(w => s"'$w'").mkString(",")}])"
      }.mkString(",")
    s"""WITH prof(lang, words) AS (VALUES $profRows),
base AS (
  SELECT doc_id, lang AS labeled_lang, text,
    ${toksExpr("text")} AS toks,
    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}\\x{3400}-\\x{4dbf}]', '', 'g')) AS han,
    length(regexp_replace(text, '[^\\x{3040}-\\x{30ff}]', '', 'g')) AS kana,
    length(regexp_replace(text, '[^\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]', '', 'g')) AS hangul,
    length(text) AS n
  FROM documents),
scored AS (
  SELECT b.doc_id, p.lang,
    CASE WHEN len(b.toks) = 0 THEN 0.0
      ELSE CAST(len(list_filter(b.toks, t -> list_contains(p.words, t))) AS DOUBLE)
        / len(b.toks) END AS score
  FROM base b CROSS JOIN prof p),
best AS (
  SELECT doc_id, lang, score FROM (
    SELECT doc_id, lang, score,
      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
    FROM scored) WHERE rn = 1)
SELECT b.doc_id, b.labeled_lang,
  CASE
    WHEN b.n = 0 THEN 'und'
    WHEN (b.han + b.kana + b.hangul) * 5 > b.n THEN
      CASE WHEN b.hangul > b.han AND b.hangul > b.kana THEN 'ko'
           WHEN b.kana * 20 > (b.han + b.kana + b.hangul) THEN 'ja'
           ELSE 'zh' END
    WHEN len(b.toks) = 0 THEN 'und'
    WHEN best.score >= $floor AND best.score > 0.0 THEN best.lang
    ELSE 'und' END AS detected_lang
FROM base b JOIN best USING (doc_id)
ORDER BY doc_id"""
  }

  /** m02: Multimodal.assetsFrom(documents) → sampleFrames → per-kind
    * frame/asset counts. The synthetic asset shape (kind cycle, utf-8
    * payload) and the frame arithmetic are exactly re-derived.
    */
  def frameSample(frameBytes: Int = 64, maxFrames: Int = 16): String =
    s"""WITH assets AS (
  SELECT doc_id AS asset_id,
    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
    octet_length(encode(text)) AS nb
  FROM documents),
frames AS (
  SELECT asset_id, kind,
    CASE WHEN kind = 'video'
      THEN least(greatest(CAST(ceil(nb / $frameBytes.0) AS INTEGER), 1), $maxFrames)
      ELSE 1 END AS nf
  FROM assets)
SELECT kind, CAST(SUM(nf) AS BIGINT) AS n_frames,
  CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets
FROM frames GROUP BY kind ORDER BY kind"""

  /** d17: Decontamination.contaminated(documents, documents where
    * doc_id % 50 = 0) — cross-set LSH candidates (corpus-side bucket
    * guard WITHOUT the >1 filter: a singleton corpus bucket can still
    * pair with a benchmark row), est prefilter, exact-Jaccard verify.
    */
  def decontamination(threshold: Double, benchMod: Int = 50): String = {
    val pre = threshold * 0.6
    s"""WITH toksrc(doc_id, t) AS (
  SELECT doc_id, ${toksExpr("text")} FROM documents),
${lshCtes("toksrc", 3, 32, 8, 1000)},
ckeep AS (
  SELECT band, bh FROM banded GROUP BY band, bh HAVING COUNT(*) <= 1000),
csized AS (SELECT * FROM banded SEMI JOIN ckeep USING (band, bh)),
bband AS (SELECT * FROM banded WHERE doc_id % $benchMod = 0),
dcand AS (
  SELECT DISTINCT c.doc_id AS doc_id, b.doc_id AS bench_id,
    c.sig AS sig_a, b.sig AS sig_b
  FROM csized c JOIN bband b USING (band, bh)
  WHERE c.doc_id <> b.doc_id),
dpre AS (
  SELECT doc_id, bench_id, $estExpr AS est_jaccard
  FROM dcand WHERE $estExpr >= $pre)
SELECT dpre.doc_id, dpre.bench_id, est_jaccard, $jaccardExpr AS jaccard
FROM dpre JOIN sets sa ON dpre.doc_id = sa.doc_id
          JOIN sets sb ON dpre.bench_id = sb.doc_id
WHERE $jaccardExpr >= $threshold
ORDER BY dpre.doc_id, dpre.bench_id"""
  }

  /** d32: Decontamination.ngramOverlap — per-corpus-doc count of word
    * n-gram positions whose FNV-1a64 hash lands in the benchmark
    * side's distinct n-gram hash set. Same shingle text + recursive
    * FNV chain as the d31 oracle; membership is compared on the HASH
    * (not the string) so even a 64-bit collision, were one ever to
    * occur, resolves identically in both engines.
    */
  def ngramOverlap(n: Int = 8, benchMod: Int = 50): String = {
    s"""WITH corpus(doc_id, t) AS (
  SELECT doc_id, ${toksExpr("text")} FROM documents
  WHERE doc_id % $benchMod <> 0),
bencht(t) AS (
  SELECT ${toksExpr("text")} FROM documents WHERE doc_id % $benchMod = 0),
csh AS (
  SELECT doc_id, array_to_string(t[sid:sid+${n - 1}], ' ') AS s
  FROM corpus, unnest(range(1, len(t) - ${n - 1} + 1)) AS u(sid)
  WHERE len(t) >= $n),
bsh AS (
  SELECT DISTINCT array_to_string(t[sid:sid+${n - 1}], ' ') AS s
  FROM bencht, unnest(range(1, len(t) - ${n - 1} + 1)) AS u(sid)
  WHERE len(t) >= $n),
strs AS (SELECT DISTINCT s FROM (SELECT s FROM csh UNION SELECT s FROM bsh)),
fnv AS (
  WITH RECURSIVE f(s, pos, h) AS (
    SELECT s, 0, CAST($FnvInit AS UBIGINT) FROM strs
    UNION ALL
    SELECT s, pos + 1,
      CAST(CAST(CAST(xor(h, CAST(ascii(s[pos+1]) AS UBIGINT)) AS HUGEINT)
        * $FnvPrime % $P64 AS UBIGINT) AS HUGEINT)
        * $FnvPrime % $P64
      FROM f WHERE pos < len(s))
  SELECT s, h FROM f WHERE pos = len(s)),
bhash AS (SELECT DISTINCT f.h FROM bsh JOIN fnv f USING (s)),
per AS (
  SELECT csh.doc_id, COUNT(*) AS n_sh,
    SUM(CASE WHEN f.h IN (SELECT h FROM bhash) THEN 1 ELSE 0 END) AS hits
  FROM csh JOIN fnv f USING (s) GROUP BY csh.doc_id)
SELECT c.doc_id,
  CAST(COALESCE(p.n_sh, 0) AS BIGINT) AS n_shingles,
  CAST(COALESCE(p.hits, 0) AS BIGINT) AS hit_shingles,
  CASE WHEN COALESCE(p.n_sh, 0) = 0 THEN 0.0
       ELSE ROUND(CAST(p.hits AS DOUBLE) / p.n_sh, 4) END AS overlap_frac,
  COALESCE(p.hits, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN per p USING (doc_id)
ORDER BY c.doc_id"""
  }

  /** d10: MinKSketch64 — normalize (lowercase, collapse whitespace,
    * cap 512) → FNV-1a64 over every char-k-gram (two rounds per UTF-16
    * code unit; `unicode()` recovers the code unit for BMP text) →
    * the m smallest DISTINCT hashes under SIGNED order → FNV-fold of
    * that ascending signature. All 64-bit arithmetic via the same
    * HUGEINT mod-2^64 decomposition as the minhash oracle.
    */
  def minKFingerprint(k: Int = 8, m: Int = 8, maxChars: Int = 512): String = {
    def twoRounds(h: String, c: String): String = {
      val r1 = s"CAST(CAST(xor($h, CAST(($c) & 255 AS UBIGINT)) AS HUGEINT) " +
        s"* $FnvPrime % $P64 AS UBIGINT)"
      s"CAST(CAST(xor($r1, CAST((($c) >> 8) & 255 AS UBIGINT)) AS HUGEINT) " +
        s"* $FnvPrime % $P64 AS UBIGINT)"
    }
    val fold = (1 to m).foldLeft(s"CAST($FnvInit AS UBIGINT)") { (acc, i) =>
      val el = s"CAST(CAST(sig[$i] AS HUGEINT) % $P64 " +
        s"+ CASE WHEN sig[$i] < 0 THEN $P64 ELSE 0 END AS UBIGINT)"
      s"CASE WHEN len(sig) >= $i THEN " +
        s"CAST(CAST(xor($acc, $el) AS HUGEINT) * $FnvPrime % $P64 AS UBIGINT) " +
        s"ELSE $acc END"
    }
    val k1 = k - 1
    s"""WITH norm AS (
  SELECT doc_id,
    substr(regexp_replace(regexp_replace(lower(text), '^\\s+', ''), '\\s+', ' ', 'g'), 1, $maxChars) AS s
  FROM documents),
nl AS (SELECT doc_id, s, length(s) AS len FROM norm),
grams AS (
  WITH RECURSIVE g(doc_id, pos, j, h) AS (
    SELECT doc_id, u.pos, 0, CAST($FnvInit AS UBIGINT)
    FROM nl, unnest(range(1, greatest(len - $k1, 1) + 1)) AS u(pos)
    UNION ALL
    SELECT g.doc_id, g.pos, g.j + 1,
      ${twoRounds("g.h", "unicode(substr(n.s, CAST(g.pos + g.j AS INTEGER), 1))")}
    FROM g JOIN nl n USING (doc_id)
    WHERE g.j < $k AND g.pos + g.j <= n.len)
  SELECT g.doc_id, g.pos, g.h
  FROM g JOIN nl n USING (doc_id)
  WHERE g.j = least($k, greatest(n.len - g.pos + 1, 0))),
hs AS (
  SELECT DISTINCT doc_id,
    CASE WHEN h >= 9223372036854775808 THEN CAST(h - $P64 AS BIGINT)
         ELSE CAST(h AS BIGINT) END AS hv
  FROM grams),
topm AS (
  SELECT doc_id, list(hv ORDER BY hv) AS sig FROM (
    SELECT doc_id, hv,
      ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hv) AS rn
    FROM hs) WHERE rn <= $m GROUP BY doc_id)
SELECT doc_id,
  CASE WHEN $fold >= 9223372036854775808
    THEN CAST($fold - $P64 AS BIGINT)
    ELSE CAST($fold AS BIGINT) END AS sketch_fp
FROM topm ORDER BY doc_id"""
  }

  /** m01: Multimodal.extractFeatures bin counts — the 8-bin byte
    * histogram of each asset's utf-8 payload, rebuilt from
    * hex(encode(text)) 2-char pairs (bin = first hex digit >> 1). The
    * Spark side projects the float features back to exact integer
    * counts via round(v * n_bytes), so the compare is integer-exact
    * with no float-formatting dependence.
    */
  def multimodalFeatures(): String =
    """WITH assets AS (
  SELECT doc_id AS asset_id,
    ['image','audio','video'][(doc_id % 3) + 1] AS kind,
    regexp_extract_all(hex(encode(text)), '..') AS pairs,
    octet_length(encode(text)) AS nb
  FROM documents),
bybin AS (
  SELECT asset_id, (strpos('0123456789ABCDEF', p[1:1]) - 1) // 2 AS dim,
    COUNT(*) AS cnt
  FROM assets, unnest(pairs) AS u(p)
  GROUP BY asset_id, dim)
SELECT a.asset_id, a.kind, CAST(a.nb AS BIGINT) AS n_bytes,
  CAST(d.dim AS BIGINT) AS dim,
  CAST(COALESCE(b.cnt, 0) AS BIGINT) AS bin_count
FROM assets a
CROSS JOIN unnest(range(0, 8)) AS d(dim)
LEFT JOIN bybin b ON b.asset_id = a.asset_id AND b.dim = d.dim
ORDER BY a.asset_id, d.dim"""

  /** d22: Dedup.bloomNewDocs(corpus = doc_id%2=0, delta = doc_id%3=0)
    * — the Bloom double-hash family re-derived exactly: h1 =
    * FNV-1a64(lower(text)) with TWO rounds per UTF-16 code unit
    * (Sketch.fnv1a64; `unicode()` recovers code units for BMP text),
    * h2 = (h1·A + B) | 1 via the HUGEINT-decomposed 64-bit multiply,
    * position_i = low bits of (h1 + i·h2) — numBits is a power of two,
    * so the JVM's wrapped sum and the HUGEINT true sum share them.
    * bloom_hit = all k delta positions present in the corpus position
    * set; is_dup = exact key membership.
    */
  def bloomDedup(numHashes: Int = 6, numBits: Int = 65536): String = {
    val (a, b) = graft.functions.Bloom.h2Mixer
    val m64 = (BigInt(1) << 64) - 1
    val au = BigInt(a) & m64
    val bu = BigInt(b) & m64
    val (ahi, alo) = (au >> 32, au & 0xffffffffL)
    def twoRounds(h: String, c: String): String = {
      val r1 = s"CAST(CAST(xor($h, CAST(($c) & 255 AS UBIGINT)) AS HUGEINT) " +
        s"* $FnvPrime % $P64 AS UBIGINT)"
      s"CAST(CAST(xor($r1, CAST((($c) >> 8) & 255 AS UBIGINT)) AS HUGEINT) " +
        s"* $FnvPrime % $P64 AS UBIGINT)"
    }
    s"""WITH keys AS (
  SELECT doc_id, lower(text) AS key,
    doc_id % 3 = 0 AS is_delta, doc_id % 2 = 0 AS is_corpus
  FROM documents WHERE doc_id % 3 = 0 OR doc_id % 2 = 0),
kl AS (SELECT doc_id, key, length(key) AS len FROM keys),
fnv AS (
  WITH RECURSIVE f(doc_id, pos, h) AS (
    SELECT doc_id, 0, CAST($FnvInit AS UBIGINT) FROM kl
    UNION ALL
    SELECT f.doc_id, f.pos + 1,
      ${twoRounds("f.h", "unicode(substr(k.key, CAST(f.pos + 1 AS INTEGER), 1))")}
    FROM f JOIN kl k USING (doc_id) WHERE f.pos < k.len)
  SELECT f.doc_id, f.h AS h1 FROM f JOIN kl k USING (doc_id)
  WHERE f.pos = k.len),
h2c AS (
  SELECT doc_id, h1,
    (CAST(h1 AS HUGEINT) * $alo
      + (h1 % 4294967296) * $ahi % 4294967296 * 4294967296
      + $bu) % $P64 AS mv
  FROM fnv),
hh AS (SELECT doc_id, h1, mv - (mv % 2) + 1 AS h2 FROM h2c),
pos AS (
  SELECT doc_id,
    CAST((CAST(h1 AS HUGEINT) + u.i * h2) % $numBits AS INTEGER) AS p
  FROM hh, unnest(range(0, $numHashes)) AS u(i)),
cpos AS (
  SELECT DISTINCT p FROM pos JOIN keys USING (doc_id) WHERE is_corpus),
dhit AS (
  SELECT dp.doc_id, bool_and(c.p IS NOT NULL) AS bloom_hit
  FROM (SELECT pos.doc_id, pos.p FROM pos JOIN keys USING (doc_id)
        WHERE is_delta) dp
  LEFT JOIN cpos c ON c.p = dp.p
  GROUP BY dp.doc_id)
SELECT k.doc_id, dh.bloom_hit,
  k.key IN (SELECT key FROM keys WHERE is_corpus) AS is_dup
FROM keys k JOIN dhit dh USING (doc_id)
WHERE k.is_delta ORDER BY k.doc_id"""
  }

  /** d24: QuantileGate.keepAbove(quality, lang, q) — the rounded d07
    * quality score per document, per-language quantile_cont threshold
    * (interpolated exact percentile — the same composition q33 proves
    * equal to Spark's `percentile`), keep score >= threshold.
    */
  def qualityQuantileGate(q: Double): String =
    s"""WITH f AS (
  SELECT doc_id, lang,
    CAST(len(${toksExpr("text")}) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^!-~]|[0-9A-Za-z]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS punct_ratio,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS digit_ratio,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS upper_ratio,
    CAST(len(list_distinct(${toksExpr("text")})) AS DOUBLE)
      / greatest(len(${toksExpr("text")}), 1) AS distinct_token_ratio
  FROM documents),
qf AS (
  SELECT doc_id, lang,
    round((((
      (CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.3 END) * 0.3
      + (1.0 - least(punct_ratio * 3.0, 1.0)) * 0.2)
      + (1.0 - least(digit_ratio * 3.0, 1.0)) * 0.15)
      + (1.0 - least(upper_ratio * 4.0, 1.0)) * 0.15)
      + least(distinct_token_ratio * 2.0, 1.0) * 0.2, 4) AS quality
  FROM f),
thr AS (SELECT lang, quantile_cont(quality, $q) AS thr FROM qf GROUP BY lang)
SELECT doc_id, lang, quality
FROM qf JOIN thr USING (lang) WHERE quality >= thr
ORDER BY doc_id"""

  /** d12: Curation.curate(documents, minQuality, nearDupThreshold) —
    * quality gate (exact d07 score formula, unrounded) → exact-dedup
    * survivors (min doc_id per lower(text)) → minhash near-dup sweep
    * over the survivors (drop every verified pair's id_b).
    */
  def curation(minQuality: Double = 0.3,
               nearDupThreshold: Double = 0.5): String = {
    val pre = nearDupThreshold * 0.6
    s"""WITH qf AS (
  SELECT *, ${toksExpr("text")} AS t,
    CAST(len(${toksExpr("text")}) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^!-~]|[0-9A-Za-z]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS punct_ratio,
    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS digit_ratio,
    CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
      / greatest(length(text), 1) AS upper_ratio,
    CAST(len(list_distinct(${toksExpr("text")})) AS DOUBLE)
      / greatest(len(${toksExpr("text")}), 1) AS distinct_token_ratio
  FROM documents),
gated AS (
  SELECT * FROM qf
  WHERE ((((CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.3 END) * 0.3
    + (1.0 - least(punct_ratio * 3.0, 1.0)) * 0.2)
    + (1.0 - least(digit_ratio * 3.0, 1.0)) * 0.15)
    + (1.0 - least(upper_ratio * 4.0, 1.0)) * 0.15)
    + least(distinct_token_ratio * 2.0, 1.0) * 0.2 >= $minQuality),
surv AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY lower(text) ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1),
${lshCtes("surv", 3, 32, 8, 1000)},
pre AS (
  SELECT id_a, id_b, sig_a, sig_b FROM cand WHERE $estExpr >= $pre),
dupb AS (
  SELECT DISTINCT id_b FROM pre
  JOIN sets sa ON pre.id_a = sa.doc_id
  JOIN sets sb ON pre.id_b = sb.doc_id
  WHERE $jaccardExpr >= $nearDupThreshold)
SELECT doc_id, lang, n_chars FROM surv
WHERE doc_id NOT IN (SELECT id_b FROM dupb)
ORDER BY doc_id"""
  }
}

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

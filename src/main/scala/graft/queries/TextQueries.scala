package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Training-data text operators over the `documents` table: dedup
  * (exact / MinHash-LSH / SimHash), token counting, quality scoring,
  * language ID, fingerprinting. SQL-expressible ops carry DuckDB
  * oracles; sketch-based ops are rows-only (driver's weaker check) and
  * are covered by ScalaTest fixtures instead.
  */
object TextQueries {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "documents")

  /** Single-file sources arrive as one input split; per-row-compute-
    * heavy entries spread rows over the cluster first. CONDITIONAL
    * (round 18): this used to be an unconditional repartition — at
    * production scan widths (a 100 TB table arrives as thousands of
    * row-group splits, already ≥ the cluster's parallelism) that is a
    * gratuitous full-corpus round-robin exchange, each row paying the
    * sort-before-repartition tax (guide §2.5), on every entry that
    * spreads. Q.fanOut repartitions only when the source arrives
    * narrower than the cluster can use — identical plan at the bench's
    * single-row-group widths, a structural no-op at scale. Values are
    * partition-width-invariant by construction (the check_invariance
    * gate proves the whole catalog 107/107 across coprime widths).
    */
  private def spread(s: org.apache.spark.sql.SparkSession, d: String) =
    Q.fanOut(docs(s, d))

  val all: Seq[Q] = Seq(

    Q("d01_dedup_exact",
      (s, d) => Dedup.exact(docs(s, d), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
              FROM documents GROUP BY lower(text) ORDER BY keep_id"""),
      headline = true),

    Q("d02_token_count",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        TextFunctions.wsTokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe_tokens"))
        .orderBy("doc_id"),
      // oracle covers the whitespace count; BPE-ish count is re-computed
      // with the same regex in DuckDB
      Some("""SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
                CAST(len(regexp_extract_all(text,
                  '''(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens
              FROM documents ORDER BY doc_id""")),

    Q("d03_text_stats",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") /
          size(split(col("text"), " "))).as("avg_word_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                CAST(LENGTH(text) AS BIGINT) AS n_chars_calc,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                  / len(string_split(text, ' ')) AS avg_word_len
              FROM documents ORDER BY doc_id""")),

    Q("d04_lang_stats",
      (s, d) => docs(s, d).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang"),
      // DuckDB SUM(BIGINT) widens to HUGEINT (int128) — pandas reads
      // that as object/float and the driver's hash diverges from
      // Spark's int64. Pin the oracle back to BIGINT.
      Some("""SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
              FROM documents GROUP BY lang ORDER BY lang""")),

    Q("d05_fingerprint_md5",
      (s, d) => docs(s, d).select(
        col("doc_id"),
        TextFunctions.md5Fingerprint(col("text")).as("fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")),

    // ── sketch/heuristic operators (rows-only; spec-tested on fixtures) ─
    Q("d06_langid",
      (s, d) => spread(s, d).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        TextFunctions.langId(col("text")).as("detected_lang"))
        .orderBy("doc_id"),
      Some(OracleSql.langId())),

    Q("d07_quality",
      (s, d) => spread(s, d)
        .withColumn("q", TextFunctions.qualityFeatures(col("text")))
        .select(col("doc_id"),
          TextFunctions.qualityScoreFromFeatures(col("q")).as("quality"),
          col("q.n_tokens").as("n_tokens"),
          round(col("q.punct_ratio"), 4).as("punct_ratio"),
          round(col("q.distinct_token_ratio"), 4).as("distinct_token_ratio"))
        .orderBy("doc_id"),
      // the full feature+score formula re-expressed in DuckDB SQL —
      // every ratio is an exact int/int division, so the doubles (and
      // the rounded score) are bit-identical
      Some(s"""WITH t AS (
                 SELECT doc_id, text,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> len(x) > 0) AS toks
                 FROM documents),
               f AS (
                 SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^!-~]|[0-9A-Za-z]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) AS punct_ratio,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) AS digit_ratio,
                   CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                     / greatest(length(text), 1) AS upper_ratio,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                     / greatest(len(toks), 1) AS distinct_token_ratio
                 FROM t)
               SELECT doc_id,
                 round((((
                   (CASE WHEN n_tokens BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.3 END) * 0.3
                   + (1.0 - least(punct_ratio * 3.0, 1.0)) * 0.2)
                   + (1.0 - least(digit_ratio * 3.0, 1.0)) * 0.15)
                   + (1.0 - least(upper_ratio * 4.0, 1.0)) * 0.15)
                   + least(distinct_token_ratio * 2.0, 1.0) * 0.2, 4) AS quality,
                 n_tokens,
                 round(punct_ratio, 4) AS punct_ratio,
                 round(distinct_token_ratio, 4) AS distinct_token_ratio
               FROM f ORDER BY doc_id""")),

    // LSH operating point: r=4,b=8 → ~50% candidate probability at
    // j≈0.6; the corpus's planted near-dups sit at j≈0.99 (recall ~1)
    // while the shared-vocabulary noise floor (j<0.3) almost never
    // collides on a 4-row band.
    Q("d08_minhash_neardups",
      (s, d) => Dedup.minhashNearDups(docs(s, d), "doc_id", "text",
        shingleWords = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .orderBy("id_a", "id_b"),
      // full differential check: the oracle re-implements the exact
      // FNV-1a64 + affine-mixer signature family in DuckDB SQL
      // (OracleSql.lshCtes) — candidates, est_jaccard and the exact
      // verify are all bit-identical
      Some(OracleSql.minhashNearDups(shingleWords = 3, numHashes = 32,
        bands = 8, threshold = 0.5)),
      headline = true),

    // hamming <= 3 of 64 bits — the classic simhash near-dup radius;
    // on this corpus that is the planted-duplicate regime (17 pairs at
    // sf0.01) while <= 12 floods with 100k+ shared-vocabulary noise
    // pairs
    // concat-and-chunk sequence packing (the pretraining layout): docs
    // are concatenated in deterministic md5-shuffled order per shard
    // and cut every 2048 tokens; docs straddle sequence boundaries.
    // Per-shard windows parallelize — no global sort.
    Q("d20_sequence_packing",
      (s, d) => graft.operators.Sampling.packSequences(
        docs(s, d), "doc_id", "n_chars", seqLen = 2048, nShards = 8)
        .select("doc_id", "shard", "seq_first", "seq_last", "seq_offset")
        .orderBy("doc_id"),
      Some("""WITH w AS (
                SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS shard, n_chars,
                       SUM(n_chars) OVER (PARTITION BY doc_id % 8
                         ORDER BY md5(CAST(doc_id AS VARCHAR))
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS e
                FROM documents)
              SELECT doc_id, shard,
                     CAST(FLOOR((e - n_chars) / 2048.0) AS BIGINT) AS seq_first,
                     CASE WHEN n_chars <= 0
                       THEN CAST(FLOOR((e - n_chars) / 2048.0) AS BIGINT)
                       ELSE CAST(FLOOR((e - 1) / 2048.0) AS BIGINT)
                     END AS seq_last,
                     CAST((e - n_chars) % 2048 AS BIGINT) AS seq_offset
              FROM w ORDER BY doc_id""")),

    // Gopher-style repetition/structure filters (Rae et al. 2021,
    // §A1.1): one single-pass integer-counter kernel per document,
    // fractions and the threshold verdict derived in the query. Purely
    // map-side — at 100 TB this runs at scan speed, no shuffle.
    Q("d19_gopher_quality",
      (s, d) => {
        val f = graft.functions.GopherStats.gopherStats(col("text"))
        def frac(num: Column, den: Column): Column =
          when(den === 0, 0.0).otherwise(round(num.cast("double") / den, 4))
        val m = docs(s, d).select(col("doc_id"), f.as("f")).select(
          col("doc_id"),
          col("f.word_count").as("word_count"),
          col("f.stopword_hits").as("stopword_hits"),
          frac(col("f.token_chars"), col("f.word_count")).as("mean_word_len"),
          frac(col("f.alpha_words"), col("f.word_count")).as("alpha_frac"),
          frac(col("f.top_bigram_chars"), col("f.token_chars")).as("top_bigram_frac"),
          when(col("f.n_lines") === 0, 0.0).otherwise(round(lit(1.0)
            - col("f.distinct_lines").cast("double") / col("f.n_lines"), 4))
            .as("dup_line_frac"),
          frac(col("f.dup_line_chars"), col("f.line_chars")).as("dup_line_char_frac"),
          frac(col("f.bullet_lines"), col("f.n_lines")).as("bullet_frac"),
          frac(col("f.ellipsis_lines"), col("f.n_lines")).as("ellipsis_frac"))
        m.withColumn("gopher_pass",
          col("word_count").between(50, 100000)
            && col("mean_word_len").between(3, 10)
            && col("alpha_frac") >= 0.8 && col("stopword_hits") >= 2
            && col("top_bigram_frac") <= 0.2 && col("dup_line_frac") <= 0.3
            && col("dup_line_char_frac") <= 0.2 && col("bullet_frac") <= 0.9
            && col("ellipsis_frac") <= 0.3)
          .orderBy("doc_id")
      },
      Some(OracleSql.gopherStats())),

    // transitive clustering of the d08 pair evidence: A~B, B~C chains
    // collapse to one component with the min id as representative —
    // the principled form of fuzzy dedup (pair-based dropping
    // mis-handles chains). Same bit-exact pair family as d08; the
    // oracle clusters with a recursive CTE.
    Q("d18_neardup_clusters",
      (s, d) => graft.operators.ConnectedComponents.clusters(
        Dedup.minhashNearDups(docs(s, d), "doc_id", "text",
          shingleWords = 3, numHashes = 32, bands = 8, threshold = 0.5),
        "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component").as("cluster_id"),
          col("component_size").as("cluster_size"))
        .orderBy("doc_id"),
      Some(OracleSql.nearDupClusters(shingleWords = 3, numHashes = 32,
        bands = 8, threshold = 0.5))),

    Q("d09_simhash_neardups",
      (s, d) => Dedup.simhashNearDups(docs(s, d), "doc_id", "text",
        bands = 4, maxHamming = 3)
        .orderBy("id_a", "id_b"),
      Some(OracleSql.simhashNearDups(bands = 4, maxHamming = 3))),

    // inverted-index term statistics: per-doc top-5 terms by term
    // frequency, with corpus document frequency (TF-IDF's exact-integer
    // core — explode → two aggregations → per-doc top-k)
    Q("d13_term_stats",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = spread(s, d).select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        val tf = tok.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        // document frequency derived FROM tf: each (doc_id, term) pair
        // appears exactly once there, so a plain count per term equals
        // count_distinct(doc_id) over tok without the two-phase
        // distinct-aggregate expansion. Column pruning makes the two
        // tf consumers canonicalize differently, so this is a two-
        // tokenize plan — the structural minimum for corpus-global DF
        // alongside per-doc TF without caching the exploded corpus.
        val df_ = tf.groupBy("term")
          .agg(count(lit(1)).as("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("tf").desc, col("term"))
        // rank FIRST (WindowGroupLimit keeps ≤5 rows per doc ahead of
        // the sort), join the vocab-scale DF table onto the k·docs
        // survivors — not onto every (doc, term) pair.
        // shuffle_merge-pinned (round 17): BOTH sides are data-
        // dependent and unbounded — the survivors side is 5 rows per
        // document (corpus-proportional), the DF side is the corpus
        // VOCABULARY (web-scale: billions of distinct terms) — so
        // neither is ever a legal broadcast at 100 TB, and left
        // unhinted AQE runtime-converted this join with a per-draw
        // NONDETERMINISTIC build side (BuildLeft ↔ BuildRight on
        // identical code+data — caught by the round-17 bench plan
        // fingerprint on its first run, the same conversion class as
        // the d08/d09/e04 fences). Sort-merge is the strategy that
        // spills both sides; a SHJ build of the vocabulary cannot.
        tf.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .join(df_.hint("shuffle_merge"), "term")
          .select("doc_id", "term", "tf", "df")
          .orderBy(col("doc_id"), col("tf").desc, col("term"))
      },
      Some("""WITH tok AS (
                SELECT doc_id,
                  unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> len(x) > 0)) AS term
                FROM documents),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf
                     FROM tok GROUP BY doc_id, term),
              dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df
                      FROM tok GROUP BY term),
              r AS (SELECT doc_id, term, tf, df,
                      ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY tf DESC, term) AS rn
                    FROM tf JOIN dfq USING (term))
              SELECT doc_id, term, tf, df FROM r WHERE rn <= 5
              ORDER BY doc_id, tf DESC, term""")),

    // end-to-end curation pass (quality gate → exact dedup → near-dup
    // sweep) — the composed pipeline a training corpus runs
    // curateManaged computes the gated/deduped survivors ONCE (the
    // no-cache curate() runs the gate kernels and dedup shuffle ~twice
    // — its two consumers prune different columns, so ReuseExchange
    // can't merge them). The small final result is materialized
    // eagerly so the cached survivors frame can be released before
    // returning — no cache outlives the call (the round-2 leak class).
    Q("d12_curation",
      (s, d) => {
        val (cur, release) = graft.operators.Curation.curateManaged(
          spread(s, d), "doc_id", "text",
          minQuality = 0.3, nearDupThreshold = 0.5)
        // release in finally: the eager checkpoint is where a job
        // cancellation (FAIR-pool kill, serving timeout) lands, and the
        // managed persist must not outlive the entry either way
        val out =
          try cur.select("doc_id", "lang", "n_chars").localCheckpoint(true)
          finally release()
        out.orderBy("doc_id")
      },
      // the whole curation pipeline re-derived in SQL: unrounded d07
      // quality formula → min-id exact survivors → LSH sweep over the
      // survivors with the same signature family as d08
      Some(OracleSql.curation(minQuality = 0.3, nearDupThreshold = 0.5)),
      headline = true),

    // PII audit over the corpus (regex subset shared by Java regex and
    // RE2, so the counts oracle-match; the synthetic corpus is clean →
    // the oracle asserts exactly that)
    Q("d16_pii_audit",
      (s, d) => docs(s, d)
        .withColumn("c", graft.functions.Redaction.piiCounts(col("text")))
        .groupBy()
        .agg(count(lit(1)).as("n_docs"),
          sum(col("c.n_emails")).as("total_emails"),
          sum(col("c.n_urls")).as("total_urls"),
          sum(col("c.n_ips")).as("total_ips")),
      // the oracle applies the SAME strip cascade piiCounts does
      // (emails counted on URL-stripped text, IPs on the URL+email-
      // stripped text) — counting every category on raw text diverges
      // whenever a URL embeds an email-/IP-shaped token. Sums cast
      // back to BIGINT (DuckDB widens SUM(BIGINT) to HUGEINT).
      Some("""WITH c AS (
                SELECT text,
                  regexp_replace(text, 'https?://[^\s]+', '', 'g') AS no_url
                FROM documents),
              c2 AS (
                SELECT text, no_url,
                  regexp_replace(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g') AS no_email
                FROM c)
              SELECT COUNT(*) AS n_docs,
                CAST(SUM(len(regexp_extract_all(no_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS total_emails,
                CAST(SUM(len(regexp_extract_all(text, 'https?://[^\s]+'))) AS BIGINT) AS total_urls,
                CAST(SUM(len(regexp_extract_all(no_email, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) AS BIGINT) AS total_ips
              FROM c2""")),

    // deterministic stratified sample: 20 docs per language by md5
    // hash order (reproducible across engines — oracle-checked)
    Q("d14_stratified_sample",
      (s, d) => graft.operators.Sampling
        .stratified(docs(s, d), "lang", "doc_id", n = 20)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
                FROM documents) WHERE rn <= 20
              ORDER BY doc_id""")),

    // greedy per-language token budget (training-mix quota fill)
    Q("d15_token_budget",
      (s, d) => graft.operators.Sampling
        .tokenBudget(docs(s, d), "lang", "doc_id", "n_chars",
          budget = 5000L)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       SUM(n_chars) OVER (PARTITION BY lang
                         ORDER BY md5(CAST(doc_id AS VARCHAR))
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
                FROM documents) WHERE running <= 5000
              ORDER BY doc_id""")),

    // temperature-scaled training mix: per-source quotas ∝ sqrt(count)
    // (alpha-sampling, the GPT-3/LLaMA source-rebalance), filled by
    // deterministic hash-rank selection
    Q("d28_temperature_mix",
      (s, d) => graft.operators.Sampling.temperatureMixture(
        docs(s, d), "source", "doc_id", total = 100)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id"),
      // quota arithmetic is exact fixed-point (micro-weight longs +
      // integer division) to mirror temperatureMixture: double FLOOR
      // is engine-unstable when a uniform corpus puts every quota
      // exactly on an integer boundary (caught at the sf10 sweep)
      Some("""WITH c AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY source),
              w AS (SELECT source, CAST(round(sqrt(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS wu FROM c),
              s AS (SELECT SUM(wu) AS wsum FROM w),
              q AS (SELECT source, CAST(CAST(100 AS HUGEINT) * wu // wsum AS BIGINT) AS quota
                    FROM w CROSS JOIN s),
              r AS (SELECT doc_id, source, lang, n_chars,
                      ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
                    FROM documents)
              SELECT doc_id, source, lang, n_chars
              FROM r JOIN q USING (source) WHERE rn <= quota
              ORDER BY doc_id""")),

    // train/test contamination sweep: every 50th document stands in as
    // the benchmark set; a corpus doc near-duplicating any benchmark
    // doc is flagged (the pre-shipping decontamination check)
    Q("d17_decontamination",
      (s, d) => graft.operators.Decontamination.contaminated(
        spread(s, d), docs(s, d).filter(col("doc_id") % 50 === 0),
        "doc_id", "text", threshold = 0.5)
        .orderBy("doc_id", "bench_id"),
      Some(OracleSql.decontamination(threshold = 0.5))),

    // n-gram-overlap contamination (GPT-3 appendix-C rule): the eval
    // side's distinct 8-gram hash set broadcasts; the corpus is
    // scanned once and only per-doc count rows shuffle
    Q("d32_ngram_contamination",
      (s, d) => graft.operators.Decontamination.ngramOverlap(
        spread(s, d).filter(col("doc_id") % 50 =!= 0),
        docs(s, d).filter(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 8)
        .orderBy("doc_id"),
      Some(OracleSql.ngramOverlap(n = 8))),

    // model-based filtering (the fastText-classifier family): Naive
    // Bayes over hashed unigrams, trained by aggregation on the 80%
    // split and applied map-side via the broadcast weight table —
    // training AND inference run inside the plan, differentially
    // checked end to end
    Q("d33_nb_classifier",
      (s, d) => graft.operators.NaiveBayes.classify(
        spread(s, d), "doc_id", "text", "lang",
        trainPred = col("doc_id") % 10 < 8)
        .orderBy("doc_id"),
      Some(OracleSql.naiveBayes())),

    // corpus-level boilerplate removal (C4 repeated-span rule over
    // 5-token chunks): a chunk seen in >2 distinct docs is dropped
    // everywhere; docs reassemble from surviving chunks in order
    Q("d21_boilerplate_chunks",
      (s, d) => graft.operators.Boilerplate.dropRepeatedChunks(
        spread(s, d), "doc_id", "text", chunkTokens = 5, maxDocs = 2)
        .orderBy("doc_id"),
      Some("""WITH t AS (
                SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> len(x) > 0) AS toks
                FROM documents),
              base AS (
                SELECT doc_id, CAST(ceil(len(toks)/5.0) AS BIGINT) AS n_chunks
                FROM t),
              c AS (
                SELECT doc_id, cidx,
                  array_to_string(toks[cidx*5+1 : cidx*5+5], ' ') AS chunk
                FROM t, unnest(range(0, CAST(ceil(len(toks)/5.0) AS BIGINT))) AS u(cidx)
                WHERE len(toks) > 0),
              boiler AS (
                SELECT ck FROM (
                  SELECT md5(chunk) AS ck, COUNT(DISTINCT doc_id) AS nd
                  FROM c GROUP BY md5(chunk))
                WHERE nd > 2),
              kept AS (
                SELECT doc_id, COUNT(*) AS kept_chunks,
                  md5(array_to_string(list(chunk ORDER BY cidx), ' ')) AS clean_fp
                FROM c WHERE md5(chunk) NOT IN (SELECT ck FROM boiler)
                GROUP BY doc_id)
              SELECT b.doc_id, b.n_chunks,
                COALESCE(k.kept_chunks, 0) AS kept_chunks,
                COALESCE(k.clean_fp, md5('')) AS clean_fp
              FROM base b LEFT JOIN kept k USING (doc_id)
              ORDER BY b.doc_id""")),

    // BM25 ranked retrieval: top-20 documents for a bag-of-terms
    // query — tokens semi-filter to the query terms before any
    // aggregation, so tf/df stay terms-bounded at any corpus size
    Q("d26_bm25_search",
      (s, d) => graft.operators.Bm25.search(spread(s, d), "doc_id", "text",
        terms = Seq("spark", "hash", "merge", "window"), topN = 20),
      Some(OracleSql.bm25(terms = Seq("spark", "hash", "merge", "window"),
        topN = 20))),

    // DSIR importance weights (Xie et al. 2023): every document scored
    // by log p_target − log p_raw under hashed-unigram LMs — the
    // English subset stands in as the quality target. Fixed-size
    // bucket tables broadcast back; scoring is map-side.
    Q("d25_dsir_importance",
      (s, d) => {
        val r = spread(s, d)
        graft.operators.Dsir.score(r, r.filter(col("lang") === "en"),
          "doc_id", "text", numBuckets = 4096)
          .orderBy("doc_id")
      },
      Some(OracleSql.dsirScore(numBuckets = 4096, targetLang = "en"))),

    // exact-substring dedup signal (Lee et al. 2021): maximal spans of
    // cross-document repeated 8-token shingles, merged per document by
    // gaps-and-islands — exact span boundaries, not chunk-rounded
    Q("d31_repeated_spans",
      (s, d) => graft.operators.RepeatedSpans.spans(
        spread(s, d), "doc_id", "text", spanTokens = 8, maxDocs = 1)
        .orderBy("doc_id", "span_idx"),
      Some(OracleSql.repeatedSpans(spanTokens = 8, maxDocs = 1))),

    // corpus-relative perplexity signal (CCNet-style): every document
    // scored by cross-entropy under the corpus's own hashed-bigram LM
    // — two broadcast count tables, map-side bigram assembly
    Q("d30_bigram_crossentropy",
      (s, d) => graft.operators.NgramLm.crossEntropy(
        spread(s, d), "doc_id", "text", numBuckets = 4096)
        .orderBy("doc_id"),
      Some(OracleSql.bigramCrossEntropy(numBuckets = 4096))),

    // the DSIR pipeline end-to-end: score (d25) then Gumbel top-k
    // importance resampling — deterministic md5-derived noise makes
    // the sample itself oracle-checkable
    Q("d29_dsir_resample",
      (s, d) => {
        val r = spread(s, d)
        graft.operators.Dsir.gumbelTopK(
          graft.operators.Dsir.score(r, r.filter(col("lang") === "en"),
            "doc_id", "text", numBuckets = 4096),
          "doc_id", "dsir_score", k = 100, tau = 1.0)
          .select("doc_id", "dsir_score", "gumbel_key")
          .orderBy(col("gumbel_key").desc, col("doc_id"))
      },
      Some(OracleSql.dsirResample(numBuckets = 4096, targetLang = "en",
        k = 100, tau = 1.0))),

    // retrieval/pretraining chunking: overlapping 64-token windows
    // every 48 tokens — map-side posexplode, no shuffle; chunk payload
    // as fixed-width md5 + offsets
    Q("d27_chunk_windows",
      (s, d) => graft.operators.Chunking.slidingWindows(
        spread(s, d), "doc_id", "text", windowTokens = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx"),
      Some("""WITH t AS (
                SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                    x -> len(x) > 0) AS toks
                FROM documents),
              c AS (
                SELECT doc_id, cidx,
                  CAST(cidx * 48 AS BIGINT) AS start_tok,
                  CAST(least(64, len(toks) - cidx * 48) AS BIGINT) AS n_tokens,
                  md5(array_to_string(toks[cidx*48+1 : cidx*48+64], ' ')) AS chunk_fp
                FROM t, unnest(range(0, CAST(ceil(len(toks)/48.0) AS BIGINT))) AS u(cidx)
                WHERE len(toks) > 0)
              SELECT doc_id, CAST(cidx AS BIGINT) AS chunk_idx, start_tok,
                     n_tokens, chunk_fp
              FROM c ORDER BY doc_id, chunk_idx""")),

    // incremental-ingest dedup: a broadcast Bloom filter of the corpus
    // keys prefilters the delta; only bloom hits are exactly verified.
    // Corpus and delta deliberately overlap (ids % 6 == 0) so both the
    // true-dup and the genuinely-new paths are exercised.
    Q("d22_bloom_incremental_dedup",
      (s, d) => {
        val all = docs(s, d)
        Dedup.bloomNewDocs(
          all.filter(col("doc_id") % 2 === 0),
          all.filter(col("doc_id") % 3 === 0),
          "doc_id", "text", numBits = 65536, numHashes = 6)
          .orderBy("doc_id")
      },
      Some(OracleSql.bloomDedup(numHashes = 6, numBits = 65536))),

    // one-pass column profiler (nulls / distinct / min / max per
    // column) — the first query a pipeline runs against a new drop
    // hashStrings: the distinct-count Expand carries 32-char digests
    // for string columns instead of whole documents — the exact count
    // via fixed-width shuffle keys (the 100 TB default)
    Q("d23_column_profile",
      (s, d) => graft.operators.Profile
        .columnProfile(docs(s, d), hashStrings = true)
        .orderBy("column_name"),
      Some {
        val strings = Set("lang", "source", "text")
        val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
        cols.map { c =>
          val ndExpr = if (strings(c)) s"md5($c)" else c
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
                CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                COUNT(DISTINCT $ndExpr) AS n_distinct,
                CAST(MIN($c) AS VARCHAR) AS min_value,
                CAST(MAX($c) AS VARCHAR) AS max_value
              FROM documents"""
        }.mkString("", " UNION ALL ", " ORDER BY column_name")
      }),

    // quantile-relative quality gate: drop each language's worst
    // quartile — the threshold adapts per group instead of one global
    // cutoff over-pruning some languages
    Q("d24_quality_quantile_gate",
      (s, d) => graft.operators.QuantileGate.keepAbove(
        spread(s, d).withColumn("quality",
          TextFunctions.qualityScore(col("text"))),
        "lang", "quality", quantile = 0.25)
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id"),
      Some(OracleSql.qualityQuantileGate(0.25))),

    Q("d10_fingerprint_mink",
      (s, d) => spread(s, d).select(col("doc_id"),
        TextFunctions.minKFingerprint(col("text")).as("sketch_fp"))
        .orderBy("doc_id"),
      Some(OracleSql.minKFingerprint()))
  )
}

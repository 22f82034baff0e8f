package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TextSketches}

/** Train/test contamination sweep: find corpus documents that
  * near-duplicate any document in a benchmark/eval set — the check a
  * training pipeline runs before a corpus ships (exact-substring and
  * n-gram-overlap contamination both surface as high shingle-Jaccard).
  *
  * Shape: MinHash-LSH banding on BOTH sides, but the benchmark side is
  * small (eval sets are thousands of rows, the corpus is billions), so
  * its banded signatures and shingle sets BROADCAST — the corpus is
  * never shuffled at all. Corpus-side banding is guarded by the same
  * hash-aggregated `maxBucketSize` filter as Dedup.minhashCandidates.
  *
  * Output: one row per (corpus doc, benchmark doc) verified pair with
  * `est_jaccard` (signature agreement) and exact `jaccard`.
  */
object Decontamination {

  def contaminated(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String,
                   shingleWords: Int = 3, numHashes: Int = 32,
                   bands: Int = 8, threshold: Double = 0.5,
                   maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands

    def banded(df: DataFrame, as: String) = {
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
      }
      // shingle-less docs are excluded on the TEXT column, not by the
      // old `element_at(sig, 1) =!= MaxValue` sentinel on the projected
      // signature (round 18, the d08 find applied here): predicate
      // pushdown substitutes the projection into the pushed filter, so
      // the executed plan evaluated the MinHashSignature kernel TWICE
      // per row on every banded scan (4 scans × 2 in the committed d17
      // before-plan). `tokens(text)` nonempty is exactly the kernel's
      // sentinel condition (Sketch.shingleHashes is empty iff
      // tokenize(text) is empty; the oracle's sh CTE applies the same
      // `len(t) > 0` guard), and a filter on a base column pushes to
      // the scan without duplicating anything.
      df.filter(size(TextFunctions.tokens(col(textCol))) > 0)
        .select(col(idCol).as(as),
          TextSketches.minhashSignature(col(textCol), shingleWords, numHashes)
            .as("sig"))
        .withColumn("__b", explode(array(bandCols: _*)))
        .select(col(as), col("sig").as(s"sig_$as"),
          col("__b.band").as("band"), col("__b.bh").as("bh"))
    }

    val corpusBanded = banded(corpus, "doc_id")
    val benchBanded = banded(benchmark, "bench_id")

    // only benchmark-touched buckets can ever produce candidates, so
    // restrict the corpus to that sliver FIRST with a broadcast semi
    // join — the corpus is never shuffled, and the skew guard (a
    // degenerate bucket must not fan every benchmark row out against
    // half the corpus) aggregates the sliver, not the corpus
    val benchBuckets = benchBanded.select("band", "bh").distinct()
    val touched = corpusBanded
      .join(broadcast(benchBuckets), Seq("band", "bh"), "left_semi")
    val keep = touched.groupBy("band", "bh")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") <= maxBucketSize)
      .select("band", "bh")
    val sized = touched.join(broadcast(keep), Seq("band", "bh"))

    val cands = sized.join(broadcast(benchBanded), Seq("band", "bh"))
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id"), col("bench_id"),
        (aggregate(zip_with(col("sig_doc_id"), col("sig_bench_id"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double")
          / size(col("sig_doc_id"))).as("est_jaccard"))
      .groupBy("doc_id", "bench_id").agg(max("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold * 0.6)

    // the verify stage only needs shingle sets for CANDIDATE corpus
    // docs. The pair list is broadcast ONCE and the corpus probes it
    // with an inner broadcast join — the corpus is never shuffled here
    // either, and `cands` (whose subtree includes a corpus banding
    // scan) is referenced exactly once: a second reference (e.g. a
    // candidate-id semi join to pre-restrict the corpus) is NOT
    // exchange-deduplicated and would execute that scan twice. The
    // shingle kernel runs after the join, i.e. once per surviving
    // (doc, pair) row — pair-scale work, duplicated only for docs in
    // several pairs.
    val benchSets = benchmark.select(col(idCol).as("bench_id"),
      TextSketches.shingleHashSet(col(textCol), shingleWords).as("set_b"))

    corpus.select(col(idCol).as("doc_id"), col(textCol))
      .join(broadcast(cands), Seq("doc_id"))
      .withColumn("set_c",
        TextSketches.shingleHashSet(col(textCol), shingleWords))
      .join(broadcast(benchSets), Seq("bench_id"))
      .withColumn("jaccard",
        when(size(array_union(col("set_c"), col("set_b"))) === 0, 0.0)
          .otherwise(
            size(array_intersect(col("set_c"), col("set_b"))).cast("double") /
              size(array_union(col("set_c"), col("set_b")))))
      .filter(col("jaccard") >= threshold)
      .select("doc_id", "bench_id", "est_jaccard", "jaccard")
  }

  /** N-gram-overlap contamination report (the GPT-3 appendix-C
    * methodology: a training document is contaminated when it shares
    * any word n-gram with an eval set; the overlap fraction grades
    * severity). Complements `contaminated` — whole-document LSH finds
    * near-duplicated docs, n-gram overlap finds verbatim eval SPANS
    * quoted inside otherwise-unrelated documents.
    *
    * Scale shape: the eval side is tiny (thousands of rows vs a
    * billion-doc corpus), so its distinct n-gram hash set BROADCASTS;
    * the corpus is scanned once, shingled map-side (fixed 8-byte FNV
    * keys, never the strings), and the only shuffle is the per-doc
    * count aggregation — map-side partials collapse it to one 24-byte
    * row per document before anything moves.
    *
    * Output: one row per corpus doc — (idCol, n_shingles,
    * hit_shingles, overlap_frac, contaminated); docs with fewer than
    * `n` tokens report 0 shingles and are clean by definition.
    */
  def ngramOverlap(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String,
                   n: Int = 8): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    def shingles(df: DataFrame, cols: Column*) = {
      val t = TextFunctions.tokens(col(textCol))
      df.select(cols :+ when(size(t) >= n,
        TextFunctions.wordShingles(t, n))
        .otherwise(array().cast("array<string>")).as("__sh"): _*)
    }

    val benchHashes = shingles(benchmark)
      .select(explode(col("__sh")).as("__s"))
      .select(TextSketches.fnv64(col("__s")).as("__h"))
      .distinct()
      .withColumn("__hit", lit(1L))

    // explode_outer keeps shingle-less docs as one null-shingle row:
    // count(__h) skips the null, the null key never equi-joins, and
    // every doc stays present without a second corpus-wide join
    shingles(corpus, col(idCol))
      .select(col(idCol), explode_outer(col("__sh")).as("__s"))
      .select(col(idCol), TextSketches.fnv64(col("__s")).as("__h"))
      .join(broadcast(benchHashes), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__h")).as("n_shingles"),
        coalesce(sum(col("__hit")), lit(0L)).as("hit_shingles"))
      .withColumn("overlap_frac",
        when(col("n_shingles") === 0, 0.0)
          .otherwise(round(col("hit_shingles").cast("double")
            / col("n_shingles"), 4)))
      .withColumn("contaminated", col("hit_shingles") > 0)
  }

  /** The corpus with contaminated documents removed (the shipping
    * filter): left-anti join on the verified pair set.
    */
  def clean(corpus: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, threshold: Double = 0.5): DataFrame =
    corpus.join(
      contaminated(corpus, benchmark, idCol, textCol,
        threshold = threshold)
        .select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Ingest-time incremental dedup: the delta batch with every document
    * near-duplicating the EXISTING corpus removed (then dedup the delta
    * against itself separately with Dedup.minhashNearDups — cross-set
    * and within-set duplicates are different checks). Same asymmetric
    * LSH as decontamination with the roles swapped: the DELTA is the
    * small broadcast side, the historical corpus is only scanned —
    * which is exactly the shape an append-only 100 TB ingest needs,
    * every batch, forever.
    */
  def dedupAgainst(delta: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String, threshold: Double = 0.7): DataFrame =
    delta.join(
      contaminated(corpus, delta, idCol, textCol, threshold = threshold)
        // `bench_id` is the delta-side id in the swapped orientation
        .select(col("bench_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}

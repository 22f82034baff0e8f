package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level boilerplate removal (the C4 "repeated span" rule,
  * Raffel et al. 2020 §2.2, adapted from three-sentence spans to
  * fixed-size token chunks because the synthetic corpus carries no
  * sentence boundaries): any L-token chunk that appears in more than
  * `maxDocs` distinct documents is dropped from EVERY document, and
  * each document is reassembled from its surviving chunks in order.
  *
  * Scale shape (the whole point of doing this on Spark):
  *  - chunking is map-side (tokenize once per row — the token array is
  *    referenced twice in its projection so CollapseProject cannot
  *    inline the tokenizer into the per-chunk lambda);
  *  - the cross-corpus frequency count groups on md5(chunk) — a fixed
  *    16-byte shuffle key instead of the chunk text (same rationale as
  *    Dedup.exact);
  *  - the per-(doc,chunk) distinct collapses inside the count-distinct
  *    aggregate's partial phase, so the shuffle carries one row per
  *    distinct (chunk, doc) pair, never per occurrence;
  *  - the boilerplate set (chunks with > maxDocs docs) is the ONLY
  *    frame joined back — corpus-frequency-bounded, orders of
  *    magnitude smaller than the corpus; the anti join shuffles
  *    digests, not text. Reassembly groups by doc_id (high
  *    cardinality, no skew).
  */
object Boilerplate {

  /** Per-document cleaning result: (idCol, n_chunks, kept_chunks,
    * clean_fp) where clean_fp = md5 of the surviving chunks joined in
    * original order (md5 rather than the text itself so the result
    * stays fixed-width however large the documents are).
    */
  def dropRepeatedChunks(docs: DataFrame, idCol: String, textCol: String,
                         chunkTokens: Int = 5, maxDocs: Int = 2): DataFrame = {
    val L = chunkTokens
    val t = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))

    // chunk rows carry the doc's chunk count, so the reassembly
    // aggregate recovers n_chunks without a separate tokenizing pass —
    // the corpus is tokenized exactly twice per action (frequency
    // count + reassembly), the structural minimum without caching the
    // exploded corpus
    val chunked = t
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        ceil(size(col("__toks")).cast("double") / L).cast("long").as("n_chunks"),
        posexplode(
          transform(
            sequence(lit(0),
              (ceil(size(col("__toks")).cast("double") / L) - 1).cast("int")),
            i => array_join(slice(col("__toks"), i * L + 1, lit(L)), " ")))
          .as(Seq("cidx", "chunk")))

    val boiler = chunked
      .groupBy(md5(col("chunk")).as("__ck"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select("__ck")

    // boilerplate membership as a tag, not an anti join: one grouped
    // pass computes survivors, fingerprint, AND n_chunks — an anti
    // join would drop all-boilerplate docs and force a third
    // corpus-tokenizing branch to recover their chunk counts.
    // collect_list skips the nulls the `when` leaves on tagged rows.
    val kept = chunked
      .join(boiler.withColumn("__isb", lit(true)),
        md5(col("chunk")) === col("__ck"), "left_outer")
      .groupBy(col(idCol))
      .agg(first(col("n_chunks")).as("n_chunks"),
        count(when(col("__isb").isNull, 1)).as("kept_chunks"),
        md5(array_join(
          transform(array_sort(collect_list(
            when(col("__isb").isNull, struct(col("cidx"), col("chunk"))))),
            p => p.getField("chunk")), " ")).as("clean_fp"))

    // empty-token docs never enter `chunked`; restore them with zero
    // counts from a tokenizer-free id scan
    docs.select(col(idCol)).join(kept, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("kept_chunks"), lit(0L)).as("kept_chunks"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
  }
}

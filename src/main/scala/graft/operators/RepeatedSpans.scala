package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TextSketches}

/** Repeated-span detection — the exact-substring dedup signal of Lee
  * et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed relationally: every `spanTokens`-token
  * shingle is hashed; a shingle occurring in more than `maxDocs`
  * distinct documents is cross-document repeated; ADJACENT repeated
  * shingle positions within a document merge into maximal spans.
  * A long shared substring of length L surfaces as one span of
  * L − spanTokens + 1 shingles — the span boundaries are exact, which
  * chunk-level removal (d21/Boilerplate) cannot give.
  *
  * The suffix-array machinery of the paper is a single-machine
  * construct; the relational phrasing scales instead through:
  *  - map-side shingling (one tokenizer pass; shingles hash to fixed
  *    8-byte keys before anything shuffles);
  *  - the repeated-shingle set built by a count-distinct aggregate on
  *    the hash (map-side partial) and applied back as a semi join;
  *  - gaps-and-islands merging windowed PER DOCUMENT (partition key =
  *    doc id: high cardinality, no skew, bounded partitions).
  */
object RepeatedSpans {

  /** Maximal cross-document repeated spans per document:
    * (idCol, span_idx, start_tok, end_tok, n_shingles) — token
    * offsets 0-based inclusive.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            spanTokens: Int = 8, maxDocs: Int = 1): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive: $spanTokens")
    val k = spanTokens
    val t = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    val sh = t.filter(size(col("__toks")) >= k)
      .select(col(idCol),
        posexplode(TextFunctions.wordShingles(col("__toks"), k))
          .as(Seq("__sid", "__s")))
      .select(col(idCol), col("__sid"),
        TextSketches.fnv64(col("__s")).as("__h"))

    val repeated = sh.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > maxDocs)
      .select("__h")

    val marked = sh.join(repeated, Seq("__h"), "left_semi")
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("__sid"))
    val spans = marked
      .withColumn("__grp", col("__sid") - row_number().over(byPos))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__sid")).as("start_tok"),
        (max(col("__sid")) + (k - 1)).as("end_tok"),
        count(lit(1)).as("n_shingles"))
    val bySpan = Window.partitionBy(col(idCol)).orderBy(col("start_tok"))
    spans
      .withColumn("span_idx", row_number().over(bySpan).cast("long"))
      .select(col(idCol), col("span_idx"),
        col("start_tok").cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"),
        col("n_shingles"))
  }
}

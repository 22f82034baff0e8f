package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sliding-window document chunking — the retrieval/pretraining layout
  * that turns documents into fixed-size, optionally overlapping token
  * windows (RAG passage splitting, context-window packing prep,
  * embedding-input shaping).
  *
  * Windows start every `stride` tokens and span `windowTokens`; with
  * `stride < windowTokens` consecutive chunks overlap by `windowTokens
  * - stride` tokens (the standard retrieval-chunking recipe so no
  * boundary sentence is lost to a cut). The final window may be
  * shorter; documents with no tokens emit no chunks.
  *
  * Scale shape: one tokenizer pass per row (the token array is a named
  * projection referenced by the chunk lambda and the count, so
  * CollapseProject cannot inline the regex per element), then a
  * map-side `posexplode` — chunking is embarrassingly parallel and
  * runs at scan speed; there is no shuffle at all. Chunk text is
  * emitted as an md5 fingerprint plus offsets, not the raw substring,
  * so the result stays fixed-width however large the documents are
  * (the caller re-slices the original text by offsets when it needs
  * the payload).
  */
object Chunking {

  /** Per-chunk rows: (idCol, chunk_idx, start_tok, n_tokens, chunk_fp).
    */
  def slidingWindows(docs: DataFrame, idCol: String, textCol: String,
                     windowTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(windowTokens > 0, s"windowTokens must be positive: $windowTokens")
    require(stride > 0, s"stride must be positive: $stride")
    val t = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    t.filter(size(col("__toks")) > 0)
      .select(col(idCol), col("__toks"),
        // number of windows with start < n at every `stride` tokens
        ceil(size(col("__toks")).cast("double") / stride).cast("int").as("__nw"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nw") - 1), i =>
          struct(
            (i * stride).cast("long").as("start_tok"),
            least(lit(windowTokens),
              size(col("__toks")) - i * stride).cast("long").as("n_tokens"),
            md5(array_join(slice(col("__toks"), i * stride + 1,
              lit(windowTokens)), " ")).as("chunk_fp"))))
          .as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c.start_tok").as("start_tok"),
        col("__c.n_tokens").as("n_tokens"),
        col("__c.chunk_fp").as("chunk_fp"))
  }
}

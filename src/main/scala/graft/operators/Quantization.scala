package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorKernels

/** Int8 scalar quantization of embedding columns — the standard
  * memory-reduction step for large-scale vector serving (a 100 TB
  * float32 corpus becomes ~25 TB of int8 codes, which is the
  * difference between a corpus that fits the cluster's page cache and
  * one that doesn't).
  *
  * Scheme: per-vector absmax scaling — `scale = max|x_i| / 127`,
  * `q_i = clamp(round(x_i / scale), -127, 127)`. Per-vector (rather
  * than per-corpus) scales need no global pass, so quantization is a
  * pure map-side transform that pipelines with the scan.
  *
  * Search over quantized vectors needs no dequantization: with
  * per-vector scales, cosine is scale-invariant —
  * `cos(s_a·qa, s_b·qb) = cos(qa, qb)` — so scoring runs on the raw
  * int codes (exact integer dot products accumulated in double, so the
  * score is partition-order independent and differentially testable).
  */
object Quantization {

  /** clamp(round(x / scale)) to [-127, 127]; all-zero vectors (scale
    * 0) quantize to zero codes. Rounding is written out as
    * floor(r + 0.5) / ceil(r − 0.5) (half away from zero) instead of
    * `round()` so both engines execute the identical IEEE op sequence
    * — library round() tie semantics never enter the differential.
    */
  private def quantExpr(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x => {
        val r = x.cast("double") / scale
        greatest(lit(-127), least(lit(127),
          when(r >= 0, floor(r + 0.5)).otherwise(ceil(r - 0.5)).cast("int")))
      }))

  /** (idCol, qv: array<int> codes, scale: double) — the serving-layout
    * frame a pipeline materializes next to (or instead of) the float
    * corpus. `scale` alone reconstructs `x_i ≈ q_i * scale`.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val amax = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol),
      (amax / 127.0).as("scale"),
      col(vecCol).as("__v"))
      .select(col(idCol), quantExpr(col("__v"), col("scale")).as("qv"),
        col("scale"))
  }

  /** Exact brute-force top-k over the int8 codes: same broadcast-the-
    * queries / never-shuffle-the-corpus / bounded-heap-rank plan as
    * Similarity.bruteTopK, with 4× less corpus I/O. The returned
    * `cosine` is the int8-approximated similarity.
    */
  def topKInt8(queries: DataFrame, corpus: DataFrame, idCol: String,
               vecCol: String, k: Int): DataFrame = {
    val q = quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qv").as("qa"))
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qv").as("qb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qa"), col("qb")))
    Similarity.rankTopK(scored, k)
  }
}

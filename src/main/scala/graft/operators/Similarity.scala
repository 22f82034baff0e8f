package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorKernels

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - `bruteTopK`: the exact baseline — broadcast the (small) query set
  *    against the corpus; every executor scores its corpus partitions
  *    locally, then a per-query top-k. One narrow shuffle of k rows per
  *    query; the corpus is never shuffled. This is the right *exact*
  *    plan at any corpus size as long as the query side stays
  *    broadcastable.
  *  - `srpTopK`: the scale path — signed-random-projection buckets
  *    prune the corpus to same-bucket (+ optional 1-bit multiprobe)
  *    candidates before scoring. Recall is tunable via plane count and
  *    probes.
  *  - `labelCentroids`: element-wise mean per label via posexplode →
  *    (label, dim) partial aggregation — no single-node reduce of wide
  *    vectors.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide).
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** SRP-LSH-bucketed approximate top-k. `numPlanes` controls bucket
    * granularity (2^numPlanes buckets); `multiprobe` additionally
    * probes all buckets at Hamming distance 1 (flipping each bit),
    * trading compute for recall.
    */
  def srpTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 8,
              dim: Int = 64, multiprobe: Boolean = true,
              seed: Long = 42L): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", VectorKernels.srpBucket(col("cv"), numPlanes, dim, seed))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket0", VectorKernels.srpBucket(col("qv"), numPlanes, dim, seed))
    val probes =
      if (!multiprobe) array(col("bucket0"))
      else array(col("bucket0") +:
        (0 until numPlanes).map(b => col("bucket0").bitwiseXOR(lit(1L << b))): _*)
    val q = qBase.withColumn("bucket", explode(probes)).drop("bucket0")

    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.select("query_id", "neighbor_id", "cosine").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-label centroids: posexplode to (label, dim, value), aggregate
    * mean per (label, dim), re-assemble ordered arrays. Scales to any
    * row count — the shuffle is labels × dims, independent of corpus
    * size after partial aggregation.
    *
    * The mean accumulates in DECIMAL(38,18): double SUM is
    * order-dependent across partitions, so a plain `avg` returns a
    * (slightly) different centroid on every repartition. Exact decimal
    * accumulation makes the result reproducible — and differential-
    * testable — regardless of partitioning.
    */
  def labelCentroids(corpus: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    corpus.select(col(labelCol).as("label"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("double")
        .cast(org.apache.spark.sql.types.DecimalType(38, 18)))
        .cast("double") / count(lit(1))).as("mean"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("dim"), col("mean"))))
        .as("__pairs"))
      .withColumn("centroid",
        transform(col("__pairs"), p => p.getField("mean")))
      .select("label", "centroid")

  /** Embedding-space near-duplicate pairs: same-SRP-bucket candidates
    * with cosine >= threshold (the dedup-by-embedding operator).
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numPlanes: Int = 8,
                        dim: Int = 64, seed: Long = 42L): DataFrame = {
    val v = corpus.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("bucket", VectorKernels.srpBucket(col("__v"), numPlanes, dim, seed))
    val a = v.select(col("bucket"), col(idCol).as("id_a"), col("__v").as("va"))
    val b = v.select(col("bucket"), col(idCol).as("id_b"), col("__v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorKernels.cosineSim(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TopKAgg, VectorKernels}

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

  /** Rank scored (query_id, neighbor_id, cosine) candidates to the
    * per-query top k via the bounded-heap aggregate: each task reduces
    * its candidates to <= k per query map-side, so only
    * `numPartitions × |queries| × k` heap entries shuffle — never the
    * scored candidates themselves. (The window-rank formulation
    * shuffles EVERY candidate into |queries| partitions and sorts:
    * with 10 queries over a 1B-row corpus that stage is the job.)
    * Duplicate neighbor ids (multiprobe bucket overlap) collapse
    * inside the heap, so no `distinct()` pre-pass is needed either.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val integralId = scored.schema("neighbor_id").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId) {
      // The casts are projected BEFORE the groupBy (codegen'd stage) so
      // the aggregate's children bind to plain attribute references —
      // update() then reads primitives straight off the row instead of
      // interpreting a Cast per candidate (TopKByScore.fastOrdinals).
      // Integral ids widen to bigint in the output.
      scored.select(col("query_id"),
        col("cosine").cast("double").as("__score"),
        col("neighbor_id").cast("long").as("__nid"))
        .groupBy("query_id")
        .agg(TopKAgg.topKByScore(col("__score"), col("__nid"), k).as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__c")))
        .select(col("query_id"),
          col("__c.id").as("neighbor_id"),
          col("__c.score").as("cosine"),
          (col("__pos") + 1).as("rank"))
    } else {
      // Non-integral ids (string/UUID/...) cannot ride the (double,
      // bigint) heap aggregate without changing tie-break semantics —
      // fall back to the window rank, which is correct for any
      // orderable id type and preserves its type. Scale caveat: the
      // window shuffles every scored candidate into |queries|
      // partitions; prefer integral ids on large corpora.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored
        // multiprobe dedup: the heap collapses duplicate neighbors at
        // insert; the window path needs the explicit best-score pass
        .groupBy("query_id", "neighbor_id")
        .agg(max(col("cosine")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    }
  }

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
    rankTopK(scored, k)
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
    rankTopK(scored, k)
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
    *
    * Bucket count is fixed at 2^numPlanes, so bucket population grows
    * O(N) with the corpus and the within-bucket self-join is
    * O(N²/2^numPlanes) — `maxBucketSize` is the same hash-aggregated
    * skew guard minhash/simhash banding uses (Dedup.minhashCandidates):
    * one hot bucket must not become the whole job. Size `numPlanes`
    * with the corpus; the guard is the backstop, not the tuning knob.
    */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, numPlanes: Int = 8,
                        dim: Int = 64, seed: Long = 42L,
                        maxBucketSize: Int = 1000): DataFrame = {
    val v = corpus.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("bucket", VectorKernels.srpBucket(col("__v"), numPlanes, dim, seed))
    // singleton buckets can't pair; oversized buckets are degenerate
    // (e.g. zero vectors all land in bucket 0) — drop both before the
    // self-join, via one map-side-combined aggregation
    val keepBuckets = v.groupBy("bucket")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") <= maxBucketSize && col("__cnt") > 1)
      .select("bucket")
    // build pinned to the keys-only filter relation (round 16, same
    // find as the LSH bucket-size joins): left unpinned, AQE's
    // compressed-size comparison can build the broadcast hash relation
    // from the embedding-carrying corpus side — the squeezable class.
    // The forced bucket shuffle is the self-join's partitioning anyway.
    val sized = v.join(keepBuckets.hint("shuffle_hash"), Seq("bucket"))
    val a = sized.select(col("bucket"), col(idCol).as("id_a"), col("__v").as("va"))
    val b = sized.select(col("bucket"), col(idCol).as("id_b"), col("__v").as("vb"))
    // merge-hinted (round 15, the d12/e08 rule): both sides are the
    // bucketed CORPUS carrying fixed-width float arrays — the class
    // whose compressed stage size sits far below its in-memory hash
    // relation, so AQE's runtime broadcast conversion can
    // nondeterministically build a corpus-sized broadcast that is a GC
    // storm at the sf1 gate and an OOM at scale (measured on d12's LSH
    // joins, same shape). Big×big ⇒ sort-merge, the strategy that
    // spills both sides; per-key width is capped by the bucket guard.
    a.hint("shuffle_merge").join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorKernels.cosineSim(col("va"), col("vb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the tuning loop for `srpTopK`/`IvfAnn` parameters (planes,
    * probes, cells). Both inputs are (query_id, neighbor_id[, ...])
    * frames, e.g. `srpTopK(...)` vs `bruteTopK(...)`. Per query:
    * |approx ∩ exact| / |exact|; overall = mean over queries. The
    * semi join keys on (query_id, neighbor_id) — result-set-scale
    * frames (|queries| × k rows), so cost is negligible next to
    * either search.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
    val x = exact.select(col("query_id"), col("neighbor_id")).distinct()
    val hits = x.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__hits"))
    x.groupBy("query_id").agg(count(lit(1)).as("__total"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        (coalesce(col("__hits"), lit(0L)).cast("double") / col("__total"))
          .as("recall"))
  }
}

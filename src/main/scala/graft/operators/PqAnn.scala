package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, DoubleType, IntegerType, StructField, StructType}

import graft.functions.{PqCodebook, PqKernels, VectorKernels}

/** Product-quantization ANN (Jégou et al. 2011): split each vector
  * into `numSub` subvectors, k-means each subspace independently
  * (`ksub` centroids), store each corpus vector as `numSub` small
  * codes, and answer queries by summing per-subspace dot products out
  * of a query-specific lookup table (asymmetric distance computation).
  *
  * Why this is the 100 TB serving shape:
  *  - the corpus compresses numSub·log2(ksub) bits per vector (64-dim
  *    float → 8 bytes here, 32×) — the codes fit where raw vectors
  *    cannot;
  *  - encode and scoring are single-pass kernels against a broadcast
  *    codebook/LUT: the corpus is NEVER shuffled, never exploded —
  *    scan, score, and feed the bounded-heap top-k (map-side k per
  *    query);
  *  - training (Lloyd over each subspace) is the only shuffling stage
  *    and runs over (m, cell, dim) partial aggregates — at real scale
  *    you train on a sample, which this API takes naturally (pass a
  *    sampled frame to `codebooks`).
  *
  * Everything is deterministic and bit-replicated by the DuckDB
  * oracle: xxhash64 seeding (the IvfAnn family), exact-decimal Lloyd
  * means, sequential-fold dot products, and squared-L2 comparisons in
  * the literal `dot(s,s) + dot(c,c) - 2·dot(s,c)` form with ties to
  * the smaller cell id.
  */
object PqAnn {

  /** Trained per-subspace centroids as (m, cell_id, centroid) — one
    * frame, `numSub × ksub` rows of metadata.
    */
  def codebooks(corpus: DataFrame, idCol: String, vecCol: String,
                numSub: Int = 8, subDim: Int = 8, ksub: Int = 16,
                iterations: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    // seeding: the ksub vectors with the smallest xxhash64(id); cell
    // j's subspace-m seed is subvector m of seed j. Metadata-scale —
    // ids assigned driver-side (same rationale as IvfAnn.centroids)
    val seedRows = corpus
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(ksub)
      .select(col("__h"), col(vecCol).cast("array<double>").as("dv"))
      .collect().sortBy(_.getLong(0))
    val seedSchema = StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("cell_id", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = true)))
    import scala.jdk.CollectionConverters._
    val seedData = for {
      (r, j) <- seedRows.zipWithIndex.toSeq
      m <- 0 until numSub
    } yield Row(m, j,
      r.getSeq[Double](1).slice(m * subDim, (m + 1) * subDim))
    val seeds = spark.createDataFrame(seedData.asJava, seedSchema)

    val subs = subVectors(corpus, idCol, vecCol, numSub, subDim)
    (1 to iterations).foldLeft(seeds) { (cents, _) =>
      IvfAnn.localized(means(assign(subs, cents)))
    }
  }

  /** (__id, m, sub): the corpus exploded into subvectors — the
    * TRAINING layout only; serving encodes in-row via PqKernels.
    */
  private def subVectors(corpus: DataFrame, idCol: String, vecCol: String,
                         numSub: Int, subDim: Int): DataFrame =
    corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__dv"))
      .select(col("__id"), posexplode(
        transform(sequence(lit(0), lit(numSub - 1)),
          mi => slice(col("__dv"), mi * subDim + 1, lit(subDim))))
        .as(Seq("m", "sub")))

  /** Nearest-centroid subspace assignment: in-row argmin against the
    * broadcast per-subspace centroid arrays (no ×ksub row inflation —
    * the IvfAnn.assign pattern, keyed by m).
    */
  private def assign(subs: DataFrame, cents: DataFrame): DataFrame = {
    val byM = cents.groupBy("m")
      .agg(collect_list(struct(col("cell_id"), col("centroid"))).as("__cs"))
    // not presence-fenced (round 18 fence audit): this broadcast lives
    // in the TRAINING fold's interior executions — invisible to a
    // final-plan walk; byM is numSub×ksub centroid structs, bounded by
    // construction, and the e07 interior fingerprint (Bench
    // SPARK_GRAFT_INTERIOR_FP) now records the executed strategy per
    // draw
    subs.join(broadcast(byM), Seq("m"))
      .withColumn("__best", array_min(transform(col("__cs"), c =>
        struct(
          (VectorKernels.dotProduct(col("sub"), col("sub"))
            + VectorKernels.dotProduct(c.getField("centroid"), c.getField("centroid"))
            - lit(2.0) * VectorKernels.dotProduct(col("sub"), c.getField("centroid")))
            .as("d"),
          c.getField("cell_id").as("cell")))))
      .select(col("__id"), col("m"), col("sub"),
        col("__best.cell").as("cell_id"))
  }

  /** Exact-decimal per-(m, cell, dim) means (partition-order-
    * independent, differential-testable — the IvfAnn/labelCentroids
    * discipline).
    */
  private def means(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("cell_id"), posexplode(col("sub")).as(Seq("dim", "v")))
      .groupBy("m", "cell_id", "dim")
      .agg((sum(col("v").cast(DecimalType(38, 18))).cast("double") /
        count(lit(1))).as("mm"))
      .groupBy("m", "cell_id")
      .agg(array_sort(collect_list(struct(col("dim"), col("mm")))).as("__p"))
      .withColumn("centroid", transform(col("__p"), p => p.getField("mm")))
      .select("m", "cell_id", "centroid")

  /** Collect a trained codebook for the in-row kernels: per subspace,
    * the surviving centroids ordered by cell id.
    */
  def trainedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                      numSub: Int = 8, subDim: Int = 8, ksub: Int = 16,
                      iterations: Int = 2): PqCodebook = {
    val rows = codebooks(corpus, idCol, vecCol, numSub, subDim, ksub,
      iterations).collect()
    val byM = rows.groupBy(_.getInt(0))
    val cells = (0 until numSub).map { m =>
      byM.getOrElse(m, Array.empty[Row]).sortBy(_.getInt(1))
        .map(r => (r.getInt(1), r.getSeq[Double](2).toArray)).toArray
    }.toArray
    PqCodebook(subDim, cells)
  }

  /** ADC top-k: encode the corpus to codes in-row, broadcast each
    * query's LUT, score map-side, rank with the bounded-heap
    * aggregate. Scores are approximate inner products (the PQ
    * reconstruction of dot(q, v)).
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, k: Int, numSub: Int = 8, subDim: Int = 8,
           ksub: Int = 16, iterations: Int = 2): DataFrame = {
    val cb = trainedCodebook(corpus, idCol, vecCol, numSub, subDim, ksub,
      iterations)
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      PqKernels.encode(col(vecCol).cast("array<double>"), cb).as("__codes"))
    val q = queries.select(col(idCol).as("query_id"),
      PqKernels.lut(col(vecCol).cast("array<double>"), cb).as("__lut"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        PqKernels.adcScore(col("__codes"), col("__lut"), cb))
    Similarity.rankTopK(scored, k).withColumnRenamed("cosine", "score")
  }
}

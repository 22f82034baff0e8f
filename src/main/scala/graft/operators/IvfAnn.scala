package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.VectorKernels

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into `nCells` Voronoi cells around k-means centroids; a query
  * probes only its `nProbe` nearest cells. The standard
  * billion-vector-scale alternative to hash-based LSH (SRP, see
  * Similarity): cells adapt to the data distribution, and recall/cost
  * is tuned by `nProbe` instead of plane count.
  *
  * Everything is DataFrame-composed and deterministic:
  *  - seeding: the `nCells` vectors with the smallest xxhash64(id) — a
  *    deterministic uniform sample, no Math.random;
  *  - Lloyd iterations: assign (in-row argmin against the broadcast
  *    centroid array) → recompute means (posexplode + (cell,dim)
  *    partial aggregation in exact DECIMAL, so centroids do not drift
  *    with partitioning);
  *  - index: (cell_id, id, vec) — at scale this is what you'd write
  *    back partitioned by cell_id for locality.
  */
object IvfAnn {

  /** A centroid frame is nCells rows of metadata — collect it and
    * re-create a LocalRelation so every downstream use (each Lloyd
    * iteration references the previous one; topK/buildIndex reference
    * the final one twice) reads nCells in-memory rows instead of
    * re-executing the corpus-scanning chain that produced them. Same
    * metadata-scale rationale as a broadcast hint.
    */
  private[operators] def localized(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** Deterministic k-means centroids as a (cell_id, centroid) frame. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iterations: Int = 2): DataFrame = {
    // cell ids are assigned driver-side: the seed frame is nCells
    // metadata rows (already collected by `localized`), and a global
    // row_number window over it would plan a single-partition
    // WindowExec that re-evaluates on every Lloyd-iteration reference
    val spark = corpus.sparkSession
    val seedRows = corpus
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nCells)
      .select(col("__h"), col(vecCol).cast("array<double>").as("centroid"))
      .collect().sortBy(_.getLong(0))
    val seedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = true)))
    import scala.jdk.CollectionConverters._
    val seeds = spark.createDataFrame(
      seedRows.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i, r.get(1))
      }.toSeq.asJava, seedSchema)

    (1 to iterations).foldLeft(seeds) { (cents, _) =>
      localized(assign(corpus, idCol, vecCol, cents)
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cell_id", "dim")
        // exact decimal mean: double SUM is partition-order-dependent,
        // and a drifting centroid makes every downstream assignment —
        // and therefore the whole index — non-reproducible
        .agg((sum(col("v").cast("double").cast(DecimalType(38, 18)))
          .cast("double") / count(lit(1))).as("m"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("__p"))
        .withColumn("centroid", transform(col("__p"), p => p.getField("m")))
        .select("cell_id", "centroid"))
    }
  }

  /** Nearest-centroid assignment: (idCol, vecCol, cell_id).
    *
    * The centroid set is collapsed to ONE row carrying an
    * array<struct<cell_id,centroid>> and broadcast; each corpus row
    * computes its argmax-cosine in-row over that array. No ×nCells row
    * inflation, no per-id window sort, no Exchange of corpus data at
    * all — the previous crossJoin+row_number formulation shuffled and
    * sorted an nCells× inflated corpus on a unique key, which at 100×
    * scale is the index build's bottleneck. Ties break toward the
    * smallest cell_id (struct max on (sim, -cell_id)), matching the
    * old (sim desc, cell_id asc) rank order exactly.
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             cents: DataFrame): DataFrame = {
    val centArr = cents
      .agg(collect_list(struct(col("cell_id"), col("centroid"))).as("__cents"))
    corpus.crossJoin(broadcast(centArr))
      .withColumn("__best", array_max(transform(col("__cents"), c =>
        struct(
          VectorKernels.cosineSim(col(vecCol), c.getField("centroid"))
            .as("sim"),
          (-c.getField("cell_id")).as("negcell")))))
      .select(col(idCol), col(vecCol),
        (-col("__best.negcell")).cast("int").as("cell_id"))
  }

  /** Build and persist the IVF index: the assigned corpus written
    * partitioned by `cell_id` (one directory per Voronoi cell) plus
    * the centroid table. This is the 100 TB serving layout: a probe
    * touches only its cells' directories, so the scan I/O is
    * `nProbe/nCells` of the corpus — enforced by partition pruning at
    * planning time, not by a filter over a full scan.
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 path: String, nCells: Int = 16,
                 iterations: Int = 2): Unit = {
    val cents = centroids(corpus, idCol, vecCol, nCells, iterations)
    assign(corpus, idCol, vecCol, cents)
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$path/index")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Query a persisted index: rank centroids per query, read ONLY the
    * probed cells (static partition pruning via the collected cell-id
    * set — metadata-scale: |queries| × nProbe ints), exact cosine
    * within them. Queries are small by contract (they broadcast).
    */
  def topKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, nProbe: Int = 3): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("cell_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__sim",
        VectorKernels.cosineSim(col("qv"), col("centroid")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "qv", "cell_id")

    val cellIds = probes.select("cell_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(s"$path/index")
      .filter(col("cell_id").isin(cellIds: _*))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("cell_id"))

    val scored = index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qv"), col("cv")))
    Similarity.rankTopK(scored, k)
  }

  /** Approximate top-k: probe the `nProbe` closest cells per query,
    * exact cosine within the probed cells only.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
           vecCol: String, k: Int, nCells: Int = 16,
           nProbe: Int = 3, iterations: Int = 2): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, nCells, iterations)
    val index = assign(corpus, idCol, vecCol, cents)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("cell_id"))

    // probe ranking: |queries| × nCells rows — the window partitions
    // are bounded by nCells regardless of corpus size, so this stage
    // is scale-safe as-is
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__sim").desc, col("cell_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__sim",
        VectorKernels.cosineSim(col("qv"), col("centroid")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "qv", "cell_id")

    // candidate ranking via the bounded-heap aggregate (map-side
    // top-k; see Similarity.rankTopK) — the scored candidates are
    // never shuffled
    val scored = index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qv"), col("cv")))
    Similarity.rankTopK(scored, k)
  }
}

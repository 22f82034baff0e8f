package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  - Lloyd iterations: assign (broadcast centroids, argmin by window)
  *    → recompute means (posexplode + (cell,dim) partial aggregation);
  *  - index: (cell_id, id, vec) — at scale this is what you'd write
  *    back partitioned by cell_id for locality.
  */
object IvfAnn {

  /** Deterministic k-means centroids as a (cell_id, centroid) frame. */
  def centroids(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iterations: Int = 2): DataFrame = {
    val seeds = corpus
      .withColumn("__h", xxhash64(col(idCol)))
      .orderBy("__h").limit(nCells)
      .withColumn("cell_id",
        (row_number().over(Window.orderBy("__h")) - 1).cast("int"))
      .select(col("cell_id"), col(vecCol).cast("array<double>").as("centroid"))

    (1 to iterations).foldLeft(seeds) { (cents, _) =>
      assign(corpus, idCol, vecCol, cents)
        .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("dim", "v")))
        .groupBy("cell_id", "dim")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("__p"))
        .withColumn("centroid", transform(col("__p"), p => p.getField("m")))
        .select("cell_id", "centroid")
    }
  }

  /** Nearest-centroid assignment: (idCol, vecCol, cell_id). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(col("__sim").desc, col("cell_id"))
    corpus.crossJoin(broadcast(cents))
      .withColumn("__sim",
        VectorKernels.cosineSim(col(vecCol), col("centroid")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("cell_id"))
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

    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorKernels.cosineSim(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cosine").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorKernels

/** SemDeDup — semantic deduplication in embedding space (Abbas et al.
  * 2023, arXiv:2303.09540): k-means-cluster the corpus embeddings,
  * then within each cluster drop every document whose cosine to
  * another cluster member with a smaller id clears the threshold
  * (one survivor per semantic duplicate group, min-id rule — the
  * same survivor discipline as the text-dedup family).
  *
  * This completes the dedup ladder: exact (d01) → MinHash/SimHash
  * lexical (d08/d09) → embedding-pair SRP (e04) → semantic-cluster
  * (this): SRP buckets catch near-identical vectors; k-means cells
  * catch *semantically* redundant documents whose wording differs.
  *
  * Scale shape: clustering reuses IvfAnn's deterministic Lloyd build
  * (broadcast centroid argmin — the corpus never shuffles for
  * assignment), and the quadratic pair scan is per-cell. The paper
  * sizes k ∝ corpus so expected cell population stays bounded — the
  * DEFAULT here (`nCells = -1`) does exactly that (k = N /
  * targetCellSize, floor 16), which is what keeps total pair work
  * linear in N; a FIXED k turns the scan into N²/k (measured 15.6×
  * per data decade on the pinned-k gate entry at a 600k-vector
  * corpus). The `maxCellSize` guard is the backstop that keeps one
  * degenerate cell (e.g. the zero-vector sink) from becoming an O(N²)
  * job, identical in spirit to the LSH bucket guards. Oversized or
  * singleton cells pair nothing — their members are all kept.
  */
object SemDedup {

  /** The cell count the auto-k rule picks for a corpus of `n` vectors:
    * the explicit `nCells` when positive, else `max(16, ceil(n /
    * targetCellSize))`. Public and pure so callers (and the oracle SQL,
    * which replays the same formula in DuckDB) can pin the chosen k
    * directly rather than inferring it from populated-cell counts.
    */
  def chooseK(n: Long, nCells: Int, targetCellSize: Int): Int =
    if (nCells > 0) nCells
    else math.max(16, ((n + targetCellSize - 1) / targetCellSize).toInt)

  /** Largest cell count for which the pairable cell-id list may be
    * HINTED as a broadcast: 4M bare longs is a few tens of MB as a
    * hash relation — comfortably inside driver/executor headroom —
    * while auto-k crosses it only past ~8B documents (4M cells ×
    * targetCellSize 2048), where a forced broadcast would be exactly
    * the OOM the hint's own rule ("broadcast iff bounded by
    * construction") forbids. Past the bound the cells⋈pairable join
    * falls to a SHUFFLE_HASH hint on the same side: the build side
    * stays pinned off the corpus (the r14 e08 lesson) at any k.
    */
  val BroadcastableCells: Int = 4 * 1000 * 1000

  /** Per-document verdicts: (idCol, cell_id, kept).
    *
    * `nCells <= 0` auto-sizes k ∝ corpus (`ceil(N / targetCellSize)`,
    * floor 16) — the paper's discipline, and the property that keeps
    * the per-cell quadratic scan LINEAR in N overall: with fixed k the
    * pair count grows as N²/k (measured: the e08 gate entry, which
    * pins k=16 for oracle parity, walks 45 s at a 600k-vector corpus
    * where auto-k stays linear). At 100 TB, always auto-size or pass
    * k ∝ N explicitly.
    */
  /** @param broadcastableCells the k bound above which the pairable
    *   cell list is SHUFFLE_HASH-pinned instead of broadcast — the
    *   production value is [[BroadcastableCells]]; it is a parameter
    *   (round 17, r16 verdict task 5) so the degraded branch — whose
    *   entire purpose is the trillion-document regime — can be
    *   executed and plan-asserted at test scale instead of needing an
    *   8-billion-document corpus.
    */
  def verdicts(corpus: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nCells: Int = -1, iterations: Int = 1,
               maxCellSize: Int = 100000,
               targetCellSize: Int = 2048,
               broadcastableCells: Int = BroadcastableCells): DataFrame = {
    val k =
      // one count job when auto-sizing; the fit below scans the corpus
      // anyway
      chooseK(if (nCells > 0) 0L else corpus.count(), nCells,
        targetCellSize)
    val cents = IvfAnn.centroids(corpus, idCol, vecCol, k, iterations)
    val cells = IvfAnn.assign(corpus, idCol, vecCol, cents)

    val pairable = cells.groupBy("cell_id")
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1 && col("__cnt") <= maxCellSize)
      .select("cell_id")
    // pairable is ≤ k rows of a bare cell_id — the build side at every
    // scale. Left unhinted, AQE's runtime broadcast conversion
    // sometimes built the hash relation from the CORPUS side instead
    // (id + full embedding, BuildLeft, reused for both pair sides):
    // measured at the sf1 gate corpus as the 2.3× slow mode of the r13
    // "bimodal e08" — which side won depended on stage-completion
    // order, hence the per-draw flip on identical code and data. BUT
    // "small by construction" holds only up to a bound (r15 ADVICE):
    // auto-k scales k LINEARLY with the corpus (N / targetCellSize),
    // so at trillion-document scale a forced broadcast of hundreds of
    // millions of cell ids would override AQE's size threshold and OOM
    // the driver. k is known driver-side, so the guard is exact: below
    // the bound, broadcast; above it, SHUFFLE_HASH on the SAME side —
    // still pins the build side away from the corpus, without shipping
    // a multi-GB relation through the driver.
    val sized =
      if (k <= broadcastableCells)
        cells.join(broadcast(pairable), Seq("cell_id"))
      else cells.join(pairable.hint("shuffle_hash"), Seq("cell_id"))
    val a = sized.select(col("cell_id"), col(idCol).as("__ida"), col(vecCol).as("__va"))
    val b = sized.select(col("cell_id"), col(idCol).as("__idb"), col(vecCol).as("__vb"))
    // both pair sides are the CORPUS (id + embedding): at any real
    // scale neither fits a broadcast, and even where one squeaks under
    // the runtime threshold, AQE's broadcast conversion is a
    // pessimization — measured at the sf1 gate corpus, the converted
    // plan draws 5.4–6.9 s where the shuffled pair join draws 2.2–3.0 s
    // (the r13 "bimodal e08" mystery: AQE flipped between the two
    // per draw). The merge hint keeps the pair join a shuffle join at
    // every scale; AQE still coalesces its partitions freely.
    val dropped = a.hint("merge").join(b.hint("merge"), Seq("cell_id"))
      .filter(col("__ida") < col("__idb"))
      .filter(VectorKernels.cosineSim(col("__va"), col("__vb")) >= threshold)
      .select(col("__idb")).distinct()

    // dropped is duplicate-count-bounded (tiny next to the corpus):
    // broadcast it so the verdict join never shuffles the corpus
    cells.select(col(idCol), col("cell_id"))
      .join(broadcast(dropped), col(idCol) === col("__idb"), "left_outer")
      .select(col(idCol), col("cell_id"), col("__idb").isNull.as("kept"))
  }

  /** Only the surviving documents (the frame a pipeline feeds on). */
  def survivors(corpus: DataFrame, idCol: String, vecCol: String,
                threshold: Double, nCells: Int = -1, iterations: Int = 1,
                maxCellSize: Int = 100000,
                targetCellSize: Int = 2048): DataFrame =
    corpus.join(
      verdicts(corpus, idCol, vecCol, threshold, nCells, iterations,
        maxCellSize, targetCellSize).filter(col("kept")).select(idCol),
      Seq(idCol), "left_semi")
}

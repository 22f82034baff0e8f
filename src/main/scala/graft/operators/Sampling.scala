package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data assembly.
  *
  * Everything orders by a content hash instead of rand(): the sample is
  * a pure function of the data — reproducible across runs, retries,
  * partitionings and engines (no seed bookkeeping, no partition-index
  * dependence like `TABLESAMPLE`/`df.sample`). md5 of the key is the
  * shared shuffle-order primitive because every engine agrees on it
  * byte-for-byte.
  */
object Sampling {

  /** Hash-order position: uniform pseudo-random, engine-portable. */
  def hashOrder(key: Column): Column = md5(key.cast("string"))

  /** Per-stratum hash-rank selection WITHOUT a per-stratum window: a
    * window shuffles every row into |strata| partitions and sorts —
    * with a handful of strata (languages, sources) those few tasks
    * are the whole job at scale. Instead the k smallest hash keys per
    * stratum are collected by a bounded map-side aggregate (MinKeys),
    * broadcast back (|strata| × k keys), and each row derives its
    * rank from `array_position` — no full-data shuffle at all.
    * Requires distinct `keyCol` values (true for primary keys).
    */
  private def selectByHashRank(df: DataFrame, stratumCol: String,
                               keyCol: String, k: Int,
                               quota: Column): DataFrame = {
    val keyed = df.withColumn("__k", hashOrder(col(keyCol)))
    // null-safe join key: groupBy keeps a NULL stratum group, and a
    // plain equi-join would silently drop those rows from the sample
    // (the window formulation ranked the NULL partition like any other)
    val keep = keyed.groupBy(col(stratumCol).as("__strat"))
      .agg(graft.functions.MinKeysAgg.minKeys(col("__k"), k).as("__keep"))
    keyed.join(broadcast(keep), col(stratumCol) <=> col("__strat"))
      .withColumn("__rnk", array_position(col("__keep"), col("__k")))
      .filter(col("__rnk") > 0 && col("__rnk") <= quota)
      .drop("__k", "__keep", "__rnk", "__strat")
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order — the deterministic form of stratified
    * sampling.
    */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 n: Int): DataFrame =
    if (n <= 0) df.limit(0)
    else selectByHashRank(df, stratumCol, keyCol, n, lit(n))

  /** Greedy token-budget selection per stratum: walk rows in hash
    * order, keep rows while the running token total stays within
    * `budget` — how per-language/per-source token quotas are filled
    * when assembling a training mix.
    *
    * Scale note: the running sum is an inherently sequential prefix
    * scan per stratum, so this stays a window. At 100 TB, bound the
    * candidate set first (e.g. `stratified` with n ≈ budget /
    * min_doc_tokens) so the window sorts a bounded set, not the
    * corpus.
    */
  def tokenBudget(df: DataFrame, stratumCol: String, keyCol: String,
                  tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(hashOrder(col(keyCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__running", sum(col(tokenCol)).over(w))
      .filter(col("__running") <= budget).drop("__running")
  }

  /** Concat-and-chunk sequence packing — the standard pretraining
    * layout: documents are (conceptually) concatenated in a
    * deterministic hash-shuffled order and the stream is cut every
    * `seqLen` tokens, so documents may straddle sequence boundaries.
    * Emits, per document: its shard, the first/last sequence index it
    * lands in, and its offset within the first sequence.
    *
    * Packing needs a total order, but a single global window is one
    * task at corpus scale — so the order is per-shard (`pmod(id,
    * nShards)`), giving nShards independent, deterministic packing
    * streams that parallelize. Real pipelines pack per output shard
    * anyway; sequence ids are (shard, seq) pairs.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long, nShards: Int = 64,
                    carryCols: Seq[String] = Nil): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy("shard").orderBy(hashOrder(col(idCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(nShards)).cast("int"))
      .withColumn("__end", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("__start", col("__end") - col(tokenCol))
      .select(col(idCol) +: carryCols.map(col) ++: Seq(
        col("shard"),
        floor(col("__start") / seqLen).as("seq_first"),
        // empty docs occupy no tokens: they "land" where they start
        when(col(tokenCol) <= 0, floor(col("__start") / seqLen))
          .otherwise(floor((col("__end") - 1) / seqLen)).as("seq_last"),
        pmod(col("__start"), lit(seqLen)).as("seq_offset")): _*)
  }

  /** Temperature-scaled mixture: quotas derive from the DATA — each
    * stratum gets `total · c_s^alpha / Σ c^alpha` rows (floored),
    * then hash-rank selection fills them. `alpha < 1` is the standard
    * training-mix rebalance (GPT-3/LLaMA-style alpha-sampling): big
    * sources are down-weighted sub-linearly so small
    * languages/domains keep representation.
    *
    * Fully in-plan: per-stratum counts are a map-side-combined
    * aggregate (|strata| rows), the quota table broadcasts back, and
    * selection is the same bounded MinKeys aggregate as `stratified`
    * — the corpus itself never shuffles.
    *
    * Determinism: alpha = 0.5 (the default) uses `sqrt`, which IEEE
    * requires correctly rounded, and weights snap to a 6-dp FIXED-POINT
    * grid (micro-weight longs); the quota is then exact integer
    * arithmetic `(total · wµ) div Σwµ` — bit-reproducible across
    * engines. Double division here is NOT safe: a uniform corpus puts
    * every quota exactly on a floor() boundary, and two engines' double
    * →decimal conventions legitimately land on opposite sides (caught
    * by the 100×-scale differential sweep, where ScaleUp's uniform
    * replication made every stratum weight identical and Spark sampled
    * 80 of the oracle's 100 rows). Other alphas go through `pow`,
    * whose last-ulp behavior is libm-specific; fine operationally, but
    * only 0.5 carries the cross-engine-exactness guarantee.
    */
  def temperatureMixture(df: DataFrame, stratumCol: String, keyCol: String,
                         total: Int, alpha: Double = 0.5): DataFrame = {
    if (total <= 0) return df.limit(0)
    val counts = df.groupBy(col(stratumCol).as("__strat2"))
      .agg(count(lit(1)).as("__c"))
    // micro-weight: round(c^alpha, 6dp) × 10^6 as an exact long
    val w = counts.withColumn("__wu",
      round((if (alpha == 0.5) sqrt(col("__c").cast("double"))
             else pow(col("__c").cast("double"), alpha)) * 1e6)
        .cast("long"))
    // Σwµ through DECIMAL(38,0), not a long SUM: per-stratum __wu stays
    // under 2^53, but a pathological stratum COUNT could push the long
    // sum past 2^63, where Spark's non-ANSI mode wraps silently and
    // corrupts every quota. Decimal overflows to null instead, and the
    // DIV below then yields null quotas → zero rows, a loud failure.
    val wsum = w.agg(sum(col("__wu").cast("decimal(38,0)")).as("__wsum"))
    // (total * wµ) div Σwµ, widened through DECIMAL(38,0) so the
    // product cannot overflow long for any realistic total × corpus
    val quotas = w.crossJoin(broadcast(wsum))
      .select(col("__strat2"),
        expr(s"CAST(CAST($total AS DECIMAL(38,0)) * __wu AS DECIMAL(38,0))" +
          " DIV __wsum").as("__quota"))
    val dfq = df.join(broadcast(quotas), col(stratumCol) <=> col("__strat2"))
      .drop("__strat2")
    selectByHashRank(dfq, stratumCol, keyCol, total, col("__quota"))
      .drop("__quota")
  }

  /** Weighted source mixture: `weights` gives each stratum a row
    * quota out of `total` (largest-remainder rounding), then the
    * stratified selection fills it.
    */
  def mixture(df: DataFrame, stratumCol: String, keyCol: String,
              weights: Map[String, Double], total: Int): DataFrame = {
    val wsum = weights.values.sum
    val quotas = weights.map { case (k, v) =>
      k -> math.round(total * v / wsum).toInt
    }
    val maxQuota = quotas.values.foldLeft(0)(_ max _)
    if (maxQuota <= 0) return df.limit(0) // empty/zero weights select nothing
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (k, q)) =>
      when(col(stratumCol) === k, q).otherwise(acc)
    }
    selectByHashRank(df, stratumCol, keyCol, maxQuota, quotaCol)
  }
}

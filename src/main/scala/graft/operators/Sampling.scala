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

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by hash order — the deterministic form of stratified
    * sampling. One shuffle on the stratum key.
    */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 n: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(hashOrder(col(keyCol)))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Greedy token-budget selection per stratum: walk rows in hash
    * order, keep rows while the running token total stays within
    * `budget` — how per-language/per-source token quotas are filled
    * when assembling a training mix.
    */
  def tokenBudget(df: DataFrame, stratumCol: String, keyCol: String,
                  tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(stratumCol).orderBy(hashOrder(col(keyCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__running", sum(col(tokenCol)).over(w))
      .filter(col("__running") <= budget).drop("__running")
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
    val w = Window.partitionBy(stratumCol).orderBy(hashOrder(col(keyCol)))
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (k, q)) =>
      when(col(stratumCol) === k, q).otherwise(acc)
    }
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quotaCol).drop("__rn")
  }
}

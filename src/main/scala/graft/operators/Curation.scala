package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** End-to-end training-corpus curation: the composition a 100 TB text
  * pipeline actually runs, built entirely from this library's
  * operators:
  *
  *   1. quality gate   (qualityScore >= minQuality)
  *   2. language gate  (langId ∈ keepLangs, when given)
  *   3. exact dedup    (survivor per normalized text)
  *   4. near-dup sweep (MinHash-LSH pairs → drop the higher id of
  *                      every verified pair)
  *
  * Stage order matters at scale: the cheap per-row gates run first and
  * shrink the corpus before any shuffle; the only wide operations are
  * the dedup groupBy and the LSH bucket join, both over survivors only.
  */
object Curation {

  final case class Report(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long)

  /** Leak-free convenience form: NO caching. The exact-survivors frame
    * feeds two consumers (the near-dup pair mining and the final
    * anti-join base), and those branches prune different column sets —
    * so their exchanges canonicalize differently and Spark's
    * ReuseExchange does NOT dedupe them: the gate kernels and dedup
    * shuffle run roughly twice per action (measured: 7 parquet scans
    * in the executed plan). That is the deliberate price of having no
    * release obligation — a persist here with no release path would
    * park a copy of the corpus in the block manager until session end,
    * one leaked copy PER CALL in a long-lived service (measured: 3× on
    * the d12 bench entry plus memory pressure on everything scheduled
    * after it, when this API used to leak). Callers that want the
    * prefix computed once — or will act on the result several times —
    * should use [[curateManaged]] and release after consuming.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             keepLangs: Option[Set[String]] = None,
             nearDupThreshold: Double = 0.7,
             transitive: Boolean = false): DataFrame =
    build(docs, idCol, textCol, minQuality, keepLangs, nearDupThreshold,
      cache = false, transitive = transitive)._1

  /** `curate` plus a cleanup handle that releases the cached survivors
    * frame. A lazy `persist` computes the survivors once across all
    * consumers and — unlike a lineage-truncating checkpoint — recovers
    * lost blocks by recomputation when an executor dies mid-job. Each
    * call owns its own cached frame (no JVM-global state: concurrent
    * pipelines can't evict each other); invoke the cleanup after
    * consuming the result, or the cached blocks live until session end.
    */
  def curateManaged(docs: DataFrame, idCol: String, textCol: String,
                    minQuality: Double = 0.5,
                    keepLangs: Option[Set[String]] = None,
                    nearDupThreshold: Double = 0.7,
                    transitive: Boolean = false): (DataFrame, () => Unit) =
    build(docs, idCol, textCol, minQuality, keepLangs, nearDupThreshold,
      cache = true, transitive = transitive)

  private def build(docs: DataFrame, idCol: String, textCol: String,
                    minQuality: Double, keepLangs: Option[Set[String]],
                    nearDupThreshold: Double,
                    cache: Boolean, transitive: Boolean): (DataFrame, () => Unit) = {
    val gated = docs
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .filter(col("__q") >= minQuality)
    val langed = keepLangs match {
      case Some(ls) => gated
        .withColumn("__lang", TextFunctions.langId(col(textCol)))
        .filter(col("__lang").isin(ls.toSeq: _*)).drop("__lang")
      case None => gated
    }
    val exactBase = Dedup.exactSurvivors(langed.drop("__q"), idCol, textCol)
    val (exact, release) =
      if (cache) {
        val p = exactBase.persist(StorageLevel.MEMORY_AND_DISK)
        (p, () => { p.unpersist(blocking = false); () })
      } else (exactBase, () => ())
    val pairs = Dedup.minhashNearDups(exact, idCol, textCol,
      threshold = nearDupThreshold)
    val result =
      if (transitive)
        // cluster the pair graph and keep one representative per
        // component — handles A~B~C chains the pair rule gets wrong
        // (see ConnectedComponents), at the cost of the iterative
        // propagation rounds
        ConnectedComponents.dedupSurvivors(exact, pairs, idCol)
      else
        // pair rule: drop the higher id of every verified pair
        exact.join(pairs.select(col("id_b").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
    (result, release)
  }

  /** Stage-by-stage survivor counts without per-stage recounts:
    * `Observation` counters are attached along the pipeline's linear
    * prefix and harvested from ONE counting action over the persisted
    * survivors frame, instead of re-deriving each stage with its own
    * count job (5 full pipeline executions). That count runs BEFORE the
    * near-dup sweep, deliberately: the sweep's interior action
    * (jaccardVerify eagerly checkpoints its candidate list, round 18)
    * would otherwise be the first execution whose lineage carries the
    * CollectMetrics nodes — and when the candidate set is EMPTY, AQE's
    * empty-relation propagation collapses that plan to an
    * EmptyRelation with no path to the metrics, which Spark 4.1's
    * ObservationManager "resolves" by completing every observation it
    * finds in the LOGICAL plan with Row.empty (observed empirically:
    * `key not found: n`). The count's own plan builds the survivors
    * cache — work the sweep needs anyway — so the prefix still executes
    * exactly once, and its result IS the after-exact count, so that
    * stage needs no observation at all.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             keepLangs: Option[Set[String]] = None,
             nearDupThreshold: Double = 0.7): Report = {
    val oIn = Observation()
    val oQ = Observation()
    val oL = Observation()
    val counted = count(lit(1)).as("n")

    val gated = docs.observe(oIn, counted)
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .filter(col("__q") >= minQuality)
      .observe(oQ, counted)
    val langed = (keepLangs match {
      case Some(ls) => gated
        .withColumn("__lang", TextFunctions.langId(col(textCol)))
        .filter(col("__lang").isin(ls.toSeq: _*)).drop("__lang")
      case None => gated
    }).observe(oL, counted)
    val exact = Dedup.exactSurvivors(langed.drop("__q"), idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // materializes the cache AND completes oIn/oQ/oL from an
      // execution that cannot lose them (see scaladoc)
      val afterExact = exact.count()
      val dupIds = Dedup.minhashNearDups(exact, idCol, textCol,
        threshold = nearDupThreshold)
        .select(col("id_b").as(idCol)).distinct()
      val afterNearDup = exact.join(dupIds, Seq(idCol), "left_anti").count()
      def n(o: Observation): Long = o.get("n").asInstanceOf[Long]
      Report(n(oIn), n(oQ), n(oL), afterExact, afterNearDup)
    } finally { exact.unpersist(blocking = false); () }
  }
}

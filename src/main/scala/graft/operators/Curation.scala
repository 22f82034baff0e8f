package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             keepLangs: Option[Set[String]] = None,
             nearDupThreshold: Double = 0.7): DataFrame = {
    val gated = docs
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .filter(col("__q") >= minQuality)
    val langed = keepLangs match {
      case Some(ls) => gated
        .withColumn("__lang", TextFunctions.langId(col(textCol)))
        .filter(col("__lang").isin(ls.toSeq: _*)).drop("__lang")
      case None => gated
    }
    // the survivors frame feeds three consumers (signatures, verify
    // sets, final anti-join); without materialization the quality gate
    // and the dedup window recompute once per consumer. localCheckpoint
    // (eager) materializes once and truncates lineage — each curate()
    // call owns its own checkpointed blocks (concurrent pipelines in
    // the multi-threaded serving layer can't evict each other, unlike
    // a JVM-global persist ref), and the ContextCleaner frees them
    // when the returned frame is dropped.
    val exact = Dedup.exactSurvivors(langed.drop("__q"), idCol, textCol)
      .localCheckpoint()
    val dupIds = Dedup.minhashNearDups(exact, idCol, textCol,
      threshold = nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct() // keep the lower id
    exact.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Stage-by-stage survivor counts (one action per stage — use for
    * reporting/tests, not in the hot path).
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             keepLangs: Option[Set[String]] = None,
             nearDupThreshold: Double = 0.7): Report = {
    val input = docs.count()
    val q = docs.withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .filter(col("__q") >= minQuality).drop("__q")
    val nQ = q.count()
    val l = keepLangs match {
      case Some(ls) => q.filter(
        TextFunctions.langId(col(textCol)).isin(ls.toSeq: _*))
      case None => q
    }
    val nL = l.count()
    val e = Dedup.exactSurvivors(l, idCol, textCol)
    val nE = e.count()
    val out = e.join(
      Dedup.minhashNearDups(e, idCol, textCol, threshold = nearDupThreshold)
        .select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
    Report(input, nQ, nL, nE, out.count())
  }
}

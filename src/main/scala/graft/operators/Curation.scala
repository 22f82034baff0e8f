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
             nearDupThreshold: Double = 0.7): DataFrame =
    curateManaged(docs, idCol, textCol, minQuality, keepLangs,
      nearDupThreshold)._1

  /** `curate` plus a cleanup handle that releases the cached survivors
    * frame. The survivors feed three consumers (signatures, verify
    * sets, final anti-join); a lazy `persist` computes them once and —
    * unlike a lineage-truncating checkpoint — recovers lost blocks by
    * recomputation when an executor dies mid-job. Each call owns its
    * own cached frame (no JVM-global state: concurrent pipelines can't
    * evict each other); long-lived services should invoke the cleanup
    * after consuming the result, or the cached blocks live until the
    * session ends.
    */
  def curateManaged(docs: DataFrame, idCol: String, textCol: String,
                    minQuality: Double = 0.5,
                    keepLangs: Option[Set[String]] = None,
                    nearDupThreshold: Double = 0.7): (DataFrame, () => Unit) = {
    val gated = docs
      .withColumn("__q", TextFunctions.qualityScore(col(textCol)))
      .filter(col("__q") >= minQuality)
    val langed = keepLangs match {
      case Some(ls) => gated
        .withColumn("__lang", TextFunctions.langId(col(textCol)))
        .filter(col("__lang").isin(ls.toSeq: _*)).drop("__lang")
      case None => gated
    }
    val exact = Dedup.exactSurvivors(langed.drop("__q"), idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = Dedup.minhashNearDups(exact, idCol, textCol,
      threshold = nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct() // keep the lower id
    val result = exact.join(dupIds, Seq(idCol), "left_anti")
    (result, () => { exact.unpersist(blocking = false); () })
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

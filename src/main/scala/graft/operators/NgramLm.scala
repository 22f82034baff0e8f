package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{MathKernels, TextFunctions, TextSketches}

/** Hashed-bigram language-model scoring — the CCNet-style "perplexity
  * filter" signal (Wenzek et al. 2020) computed from the corpus
  * itself, with no external model: train Laplace-smoothed bigram
  * statistics over hashed buckets, then score every document by its
  * average negative log-likelihood (cross-entropy, nats/bigram).
  * Low cross-entropy ≈ predictable, fluent text; high ≈ gibberish or
  * boilerplate-free noise — the standard corpus-relative quality axis
  * alongside rule-based scores (d07/d19).
  *
  *   p(wᵢ | wᵢ₋₁) = (C₂[h(wᵢ₋₁ wᵢ)] + 1) / (C₁[h(wᵢ₋₁)] + B)
  *   H(doc)       = −(1/n) Σ ln p      (n = bigram count)
  *
  * Scale shape: both count tables fold into `numBuckets` (power of
  * two) FNV buckets, so the "model" is two fixed-size broadcast
  * tables no matter the corpus; bigram assembly is a map-side
  * `zip_with` over the token array (one tokenizer pass, no
  * self-join); scoring aggregates per (doc, buckets) with map-side
  * combine. Cross-entropy is emitted without an `exp` back to
  * perplexity: exp is not correctly rounded across libms, nats are —
  * and the ordering (what a filter thresholds on) is identical.
  *
  * Determinism: counts are exact integers; ln goes through the
  * libm-parity kernel; per-bigram log-probs snap to the 9-dp grid and
  * sum in exact DECIMAL (the repo's order-independent-sum discipline).
  */
object NgramLm {

  /** (idCol, bb, ub) per bigram occurrence: bucket of the space-joined
    * bigram and bucket of its history token. Token-less and
    * single-token documents keep one NULL-bucket marker row.
    */
  private def bigramBuckets(docs: DataFrame, idCol: String, textCol: String,
                            numBuckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val pairs = when(size(col("__toks")) >= 2,
      zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(concat(a, lit(" "), b).as("bg"), a.as("w1"))))
      .otherwise(array().cast("array<struct<bg:string,w1:string>>"))
    docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), explode_outer(pairs).as("__p"))
      .select(col(idCol),
        when(col("__p").isNotNull,
          TextSketches.fnvBucket(col("__p.bg"), numBuckets)).as("bb"),
        when(col("__p").isNotNull,
          TextSketches.fnvBucket(col("__p.w1"), numBuckets)).as("ub"))
  }

  /** Per-document cross-entropy under the corpus's own hashed-bigram
    * LM: (idCol, n_bigrams, cross_entropy). Documents with fewer than
    * two tokens score 0.
    */
  def crossEntropy(corpus: DataFrame, idCol: String, textCol: String,
                   numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two: $numBuckets")
    val big = bigramBuckets(corpus, idCol, textCol, numBuckets)
    // fit both fixed-size count tables (≤ B rows each) in ONE
    // tokenizing pass: per document, unigram entries and bigram
    // entries flatten into a single tagged list, one aggregation
    // counts both kinds, and the finished model collects — as two
    // lazy plan branches, each table's broadcast job would re-run the
    // tokenizer over the whole corpus
    val entryType = "array<struct<k:tinyint,b:int>>"
    val uEntries = transform(col("__toks"),
      t => struct(lit(1).cast("tinyint").as("k"),
        TextSketches.fnvBucket(t, numBuckets).as("b"))).cast(entryType)
    val bEntries = when(size(col("__toks")) >= 2,
      zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(lit(2).cast("tinyint").as("k"),
          TextSketches.fnvBucket(concat(a, lit(" "), b), numBuckets)
            .as("b"))))
      .otherwise(array().cast(entryType)).cast(entryType)
    val modelRows = corpus
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(concat(uEntries, bEntries)).as("__e"))
      .groupBy(col("__e.k").as("k"), col("__e.b").as("b"))
      .agg(count(lit(1)).as("c")).collect()
    val spark = corpus.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    def table(kind: Int, bName: String, cName: String): DataFrame =
      spark.createDataFrame(
        modelRows.toSeq.filter(_.getByte(0) == kind)
          .map(r => Row(r.getInt(1), r.getLong(2))).asJava,
        StructType(Seq(StructField(bName, IntegerType),
          StructField(cName, LongType))))
    val c2 = table(2, "__b2", "__c2")
    val c1 = table(1, "__b1", "__c1")

    val lnP = MathKernels.libmLn(
      (col("__c2") + 1).cast("double")
        / (col("__c1") + numBuckets).cast("double"))
    big
      .groupBy(col(idCol), col("bb"), col("ub"))
      .agg(count(lit(1)).as("__n"))
      .join(broadcast(c2), col("bb") === col("__b2"), "left_outer")
      .join(broadcast(c1), col("ub") === col("__b1"), "left_outer")
      .withColumn("__lp",
        round(lnP, 9).cast(DecimalType(18, 9)))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("bb").isNotNull, col("__n")).otherwise(0L))
          .as("n_bigrams"),
        coalesce(
          sum(col("__n").cast(DecimalType(10, 0)) * col("__lp"))
            .cast("double"),
          lit(0.0)).as("__s"))
      .select(col(idCol), col("n_bigrams"),
        when(col("n_bigrams") === 0, 0.0)
          .otherwise(-(col("__s") / col("n_bigrams"))).as("cross_entropy"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions, TextSketches}

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how target-like its
  * hashed-n-gram distribution is, `log p_target(doc) − log p_raw(doc)`
  * under bag-of-hashed-unigram language models with Laplace smoothing.
  * High scores mark documents worth up-sampling when assembling a
  * training mix from a large crawl against a small quality target
  * (e.g. a curated reference corpus).
  *
  * Scale shape — why this is a two-scan-plus-map operator, not a
  * model-inference job:
  *  - features are token FNV-1a64 hashes folded into `numBuckets`
  *    (power of two, low-bits mask), so both language models are
  *    fixed-size count tables regardless of corpus size;
  *  - the bucket tables aggregate with map-side combine (≤ numBuckets
  *    rows per task reach the shuffle) and the finished weight table —
  *    numBuckets rows — is BROADCAST back; scoring is then a map-side
  *    join + per-doc aggregation that runs at scan speed;
  *  - per-doc totals group on the document id: high cardinality, no
  *    skew.
  *
  * Determinism: bucket log-weights are snapped to a 9-dp grid and the
  * per-doc sum runs in exact DECIMAL, so the score is reproducible
  * across partitionings and engines (the repo's standard
  * order-independent-sum discipline). The published pipeline follows
  * scoring with Gumbel-noise resampling; that draw is left to the
  * caller (pair the score with `Sampling.hashOrder` for a
  * deterministic analog).
  */
object Dsir {

  /** (idCol, bucket) per token occurrence; bucket = low bits of the
    * token's FNV-1a64 (numBuckets must be a power of two so the mask
    * equals unsigned mod — the oracle-parity contract).
    */
  private def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                           numBuckets: Int): DataFrame =
    docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .select(col(idCol),
        TextSketches.fnvBucket(col("__term"), numBuckets).as("bucket"))

  /** The importance-weight table: one row per bucket observed in the
    * raw corpus — `w = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))` with
    * t/r the target/raw occurrence counts and T/R their totals
    * (add-one smoothing over B buckets). Buckets the raw corpus never
    * emits are never looked up, so they need no row.
    */
  def bucketWeights(raw: DataFrame, target: DataFrame, idCol: String,
                    textCol: String, numBuckets: Int = 4096): DataFrame = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two: $numBuckets")
    // ONE job tokenizes both corpora (union with a side tag, single
    // shuffle of ≤ 2B count rows) and the fixed-size table collects,
    // re-entering the plan as a local relation. As lazy plan branches
    // the raw-side counts re-tokenized the whole raw corpus when the
    // weight broadcast materialized — on top of the scoring scan.
    val spark = raw.sparkSession
    val counts = tokenBuckets(raw, idCol, textCol, numBuckets)
      .select(lit(0).as("side"), col("bucket"))
      .unionAll(tokenBuckets(target, idCol, textCol, numBuckets)
        .select(lit(1).as("side"), col("bucket")))
      .groupBy(col("side"), col("bucket"))
      .agg(count(lit(1)).as("c")).collect()
    val rByBucket = counts.filter(_.getInt(0) == 0)
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    val tByBucket = counts.filter(_.getInt(0) == 1)
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    val rtot = rByBucket.valuesIterator.sum
    val ttot = tByBucket.valuesIterator.sum

    // Math.log IS the libm-parity kernel (MathKernels.libmLn — Spark's
    // log() is StrictMath/fdlibm and misses DuckDB by one ulp on ~2%
    // of inputs); the cast→divide→ln sequence mirrors the in-plan
    // expression op for op, so the doubles are bit-identical.
    // Buckets the raw corpus never emits are never looked up → no row.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val rows = rByBucket.toSeq.sortBy(_._1).map { case (b, r) =>
      val t = tByBucket.getOrElse(b, 0L)
      Row(b, java.lang.Math.log((t + 1).toDouble / (ttot + numBuckets).toDouble)
        - java.lang.Math.log((r + 1).toDouble / (rtot + numBuckets).toDouble))
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("bucket", IntegerType), StructField("weight", DoubleType))))
  }

  /** Gumbel top-k importance resampling — the second half of the DSIR
    * recipe: drawing k documents with probability ∝ exp(score/τ)
    * equals taking the top k of `score/τ + Gumbel(0,1)` (the Gumbel
    * top-k trick). The noise here is DETERMINISTIC: each document's
    * uniform comes from its md5 hash (the repo's engine-portable
    * randomness primitive), so the sample is a pure function of the
    * data — reproducible across runs, partitionings, and engines —
    * yet distributed exactly as importance resampling demands.
    *
    * Scale: a map-side key computation plus one TakeOrdered top-k; no
    * shuffle of the corpus. τ → 0 degenerates to deterministic
    * top-by-score; τ large approaches a uniform hash sample.
    */
  def gumbelTopK(scored: DataFrame, idCol: String, scoreCol: String,
                 k: Int, tau: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(tau > 0, s"tau must be positive: $tau")
    val ln = graft.functions.MathKernels.libmLn _
    // 13 hex digits = 52 uniform bits; (h+0.5)/2^52 keeps u in (0,1)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5) / lit(4503599627370496.0)
    val g = -ln(-ln(u))
    scored
      .withColumn("gumbel_key", col(scoreCol) / lit(tau) + g)
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** Per-document DSIR score over the raw corpus: (idCol, n_toks,
    * dsir_score). Documents with no tokens score 0.
    *
    * One scoring scan: `explode_outer` keeps a NULL-bucket row for
    * token-less documents, so every document reaches the final
    * aggregation without a second corpus scan + outer join back.
    */
  def score(raw: DataFrame, target: DataFrame, idCol: String,
            textCol: String, numBuckets: Int = 4096): DataFrame = {
    val w = bucketWeights(raw, target, idCol, textCol, numBuckets)
      // 9-dp grid → exact decimal: the per-doc sum must not depend on
      // the order bucket contributions arrive in
      .select(col("bucket"),
        round(col("weight"), 9).cast(DecimalType(18, 9)).as("__w"))
    raw.select(col(idCol),
      explode_outer(TextFunctions.tokens(col(textCol))).as("__term"))
      .select(col(idCol),
        when(col("__term").isNotNull,
          graft.functions.TextSketches.fnvBucket(col("__term"), numBuckets))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__n"))
      // left join: the NULL-bucket marker rows match no weight
      .join(broadcast(w), Seq("bucket"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("bucket").isNotNull, col("__n")).otherwise(0L))
          .as("n_toks"),
        // the decimal sum is exact on the 9-dp grid — cast it straight
        // to double (identical bits on any engine). A final round(×,4)
        // would REINTRODUCE engine divergence: grid sums land exactly
        // on .xxxx5 half-way points, where Spark's HALF_UP and
        // DuckDB's float rounding disagree. The count is cast to
        // DECIMAL(10,0), NOT left as long: long×DECIMAL(18,9) needs
        // precision 39 > 38 and Catalyst silently rounds the product
        // to scale 8, losing the grid's last digit
        coalesce(
          sum(col("__n").cast(DecimalType(10, 0)) * col("__w"))
            .cast("double"),
          lit(0.0)).as("dsir_score"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{TextFunctions, TextSketches}

/** Model-based document classification trained and applied entirely
  * inside the plan — the relational core of the fastText-style
  * quality / domain / language classifiers every modern pretraining
  * pipeline runs (CCNet's language filter, FineWeb-Edu's quality
  * scorer, DCLM's fastText gate). Multinomial Naive Bayes over hashed
  * unigrams is exactly expressible as aggregation:
  *
  *   score(d, c) = ln P(c) + Σ_b n_db · ln(cnt_cb + 1)
  *                 − n_d · ln(tok_c + B)
  *
  * (add-one smoothing over B hash buckets; the per-class constant is
  * factored out of the bucket sum, so UNSEEN (class, bucket) pairs
  * contribute exactly 0 and the weight table only needs observed
  * pairs).
  *
  * Scale shape — training is two aggregation passes, inference is
  * map-side:
  *  - the model (≤ classes × B weight rows + a classes-row stats
  *    table) is fixed-size regardless of corpus size and BROADCASTS;
  *  - scoring shuffles only per-(doc, bucket) partial counts (map-side
  *    combine), then per-(doc, class) rows — both doc-keyed, no skew;
  *  - the argmax window partitions on the doc id: high cardinality.
  *
  * Determinism: every ln() is libm-parity (MathKernels.libmLn),
  * snapped to a 9-dp grid and accumulated in exact DECIMAL — scores
  * compare identically on any engine and any partitioning (the repo's
  * standard order-independent-sum discipline, as in Dsir).
  */
object NaiveBayes {

  private val W9 = DecimalType(18, 9)

  private def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                           numBuckets: Int): DataFrame =
    docs.select(col(idCol),
      explode_outer(TextFunctions.tokens(col(textCol))).as("__term"))
      .select(col(idCol),
        when(col("__term").isNotNull,
          TextSketches.fnv64(col("__term"))
            .bitwiseAND(lit(numBuckets - 1L)).cast("int")).as("bucket"))

  /** The trained model as two frames:
    * (weights(label, bucket, w), classStats(label, prior, lnorm)) —
    * `w = ln(cnt+1)` per observed (class, bucket), `prior = ln(docs_c
    * / docs_total)`, `lnorm = ln(tok_c + B)`. All 9-dp DECIMAL.
    */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String,
            numBuckets: Int = 4096): (DataFrame, DataFrame) = {
    require(numBuckets > 0 && (numBuckets & (numBuckets - 1)) == 0,
      s"numBuckets must be a power of two: $numBuckets")
    val spark = labeled.sparkSession
    val tb = labeled
      .select(col(idCol), col(labelCol).as("label"), col(textCol))
      .select(col("label"),
        explode(TextFunctions.tokens(col(textCol))).as("__term"))
      .select(col("label"),
        TextSketches.fnv64(col("__term"))
          .bitwiseAND(lit(numBuckets - 1L)).cast("int").as("bucket"))

    // ONE corpus-tokenizing job. The fitted model is fixed-size
    // (≤ classes × B weight rows + classes stats rows) regardless of
    // corpus size, so it collects and re-enters the plan as local
    // relations: computed lazily as three plan branches, the weight
    // table and the token totals would each re-tokenize the training
    // split when their broadcasts materialize (separate jobs, so
    // ReuseExchange can't merge them) — the fit cost tripled.
    val cnts = tb.groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("cnt")).collect()
    val docCounts = labeled.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("dc")).collect() // label-only scan: no tokenize
    val docTotal = docCounts.map(_.getLong(1)).sum

    // driver-side replica of the in-plan snap(libmLn(x)) grid:
    // Math.log IS libm_ln (see MathKernels), and BigDecimal.valueOf
    // round-trips the ≤11-significant-digit 9-dp values exactly —
    // same argument the in-plan round→double→decimal cast relies on
    def snap9(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(java.lang.Math.log(x))
        .setScale(9, java.math.RoundingMode.HALF_UP)

    val labelField = cnts.headOption
      .map(_ => tb.schema("label")).getOrElse(labeled.select(
        col(labelCol).as("label")).schema("label"))
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val wSchema = StructType(Seq(labelField.copy(name = "label"),
      StructField("bucket", IntegerType), StructField("w", W9)))
    val weights = spark.createDataFrame(
      cnts.toSeq.map(r => Row(r.get(0), r.getInt(1),
        snap9((r.getLong(2) + 1).toDouble))).asJava, wSchema)

    val tokByLabel = cnts.groupBy(_.get(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val csSchema = StructType(Seq(labelField.copy(name = "label"),
      StructField("prior", W9), StructField("lnorm", W9)))
    val classStats = spark.createDataFrame(
      docCounts.toSeq.map { r =>
        val label = r.get(0)
        Row(label,
          snap9(r.getLong(1).toDouble / docTotal.toDouble),
          snap9((tokByLabel.getOrElse(label, 0L) + numBuckets).toDouble))
      }.asJava, csSchema)
    (weights, classStats)
  }

  /** Classify every document: (idCol, n_toks, predicted, score) with
    * `score` the winning class's log-posterior (exact-decimal bits
    * cast to double). Token-less documents fall back to the prior
    * argmax. Ties break on the label's sort order.
    */
  def predict(docs: DataFrame, weights: DataFrame, classStats: DataFrame,
              idCol: String, textCol: String,
              numBuckets: Int = 4096): DataFrame = {
    val nb = tokenBuckets(docs, idCol, textCol, numBuckets)
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("__n"))

    // matched-bucket partial sums per (doc, class); the null-bucket
    // marker rows of token-less docs match nothing and drop here
    // the partial sum is re-cast to DECIMAL(28,9): Spark's sum()
    // widens to DECIMAL(38,9), and the later `prior + __s` add would
    // hit precision 39 > 38, where Catalyst silently drops to scale 8
    // and loses the grid's last digit (the d25 trap, one level up)
    val sdc = nb.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__n").cast(DecimalType(10, 0)) * col("w"))
        .cast(DecimalType(28, 9)).as("__s"))

    val nd = nb.groupBy(col(idCol))
      .agg(sum(when(col("bucket").isNotNull, col("__n")).otherwise(0L))
        .as("n_toks"))

    val scored = nd.crossJoin(broadcast(classStats))
      .join(sdc, Seq(idCol, "label"), "left_outer")
      .select(col(idCol), col("label"), col("n_toks"),
        (col("prior") + coalesce(col("__s"), lit(0).cast(DecimalType(28, 9)))
          - (col("n_toks").cast(DecimalType(10, 0)) * col("lnorm"))
            .cast(DecimalType(28, 9)))
          .as("__score"))

    val byDoc = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("label"))
    scored.withColumn("__rk", row_number().over(byDoc))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("n_toks"), col("label").as("predicted"),
        col("__score").cast("double").as("score"))
  }

  /** fit + transform in one call: per-doc predictions with the actual
    * label alongside (`correct` grades them; `is_train` marks rows the
    * model saw). The standard catalog shape.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String, trainPred: Column,
               numBuckets: Int = 4096): DataFrame = {
    val (w, cs) = train(docs.filter(trainPred), idCol, textCol, labelCol,
      numBuckets)
    predict(docs, w, cs, idCol, textCol, numBuckets)
      .join(docs.select(col(idCol), col(labelCol).as("actual"),
        trainPred.as("is_train")), Seq(idCol))
      .select(col(idCol), col("n_toks"), col("actual"), col("predicted"),
        (col("actual") === col("predicted")).as("correct"),
        col("is_train"), col("score"))
  }
}

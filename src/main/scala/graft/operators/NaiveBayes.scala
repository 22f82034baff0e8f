package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape — one aggregation pass each way:
  *  - the model (≤ classes × B weight rows + a classes-row stats
  *    table) is fixed-size regardless of corpus size; training fits it
  *    in a single tokenizing job and inference carries it inside the
  *    scoring aggregate (functions.NbScore) as primitive arrays;
  *  - scoring is tokenize → map-side partial NbScore buffers → one
  *    doc-keyed shuffle of fixed-size buffers; no joins, no window,
  *    no second corpus scan — doc-keyed, so no skew.
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
          TextSketches.fnvBucket(col("__term"), numBuckets)).as("bucket"))

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
        TextSketches.fnvBucket(col("__term"), numBuckets).as("bucket"))

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
    import org.apache.spark.sql.graftshim.ColumnBridge._
    // the model is fixed-size by contract (train collects it into
    // local relations); flatten it into the primitive arrays the
    // one-pass scoring aggregate carries. The relational spelling
    // (broadcast-join weights, re-aggregate per (doc, class), join
    // stats, window argmax) read the corpus TWICE — the per-class
    // sums and the token totals are sibling consumers whose parents
    // differ, so ReuseExchange can't merge their scans (see NbScore).
    val csRows = classStats.collect()
    require(csRows.nonEmpty, "classStats is empty — train on labeled data first")
    val labels = csRows.map(_.get(0)).sorted(labelOrdering)
    val labelIdx = labels.zipWithIndex.toMap
    def nanos(d: java.math.BigDecimal): Long =
      d.setScale(9, java.math.RoundingMode.UNNECESSARY).unscaledValue()
        .longValueExact()
    val priors = new Array[Long](labels.length)
    val lnorms = new Array[Long](labels.length)
    csRows.foreach { r =>
      val i = labelIdx(r.get(0))
      priors(i) = nanos(r.getDecimal(1))
      lnorms(i) = nanos(r.getDecimal(2))
    }
    val wRows = weights.collect()
    val bucketIds = wRows.map(_.getInt(1)).distinct.sorted
    // "fixed-size by contract" is enforced, not assumed: the flat
    // weight table rides into every task as plan literals, so an
    // oversized model (a caller training with huge numBuckets × many
    // classes) must fail loudly here — not OOM the driver or ship a
    // multi-hundred-MB task binary. 2^22 longs = 32 MB, far above any
    // sane hashed-NB model (default 4096 buckets × k classes) and far
    // below task-binary pain.
    require(bucketIds.length.toLong * labels.length <= (1L << 22),
      s"NB model too large to inline: ${bucketIds.length} buckets × " +
        s"${labels.length} classes > 2^22 entries. Score relationally " +
        "instead (broadcast-join weights + per-class re-aggregation) — " +
        "at that model size the double corpus scan is cheaper than the " +
        "task-binary cost of literal weights.")
    val bucketPos = bucketIds.zipWithIndex.toMap
    val flatW = new Array[Long](bucketIds.length * labels.length)
    wRows.foreach { r =>
      labelIdx.get(r.get(0)).foreach { i =>
        flatW(bucketPos(r.getInt(1)) * labels.length + i) = nanos(r.getDecimal(2))
      }
    }

    val scoreAgg = column(graft.functions.NbScore(
      expression(col("bucket")), bucketIds, flatW, priors, lnorms)
      .toAggregateExpression())
    val labelLit = array(labels.map(l => lit(l)).toSeq: _*)
    tokenBuckets(docs, idCol, textCol, numBuckets)
      .groupBy(col(idCol))
      .agg(scoreAgg.as("__r"))
      .select(col(idCol), col("__r.n_toks").as("n_toks"),
        element_at(labelLit, col("__r.pred_idx") + 1).as("predicted"),
        col("__r.score").cast("double").as("score"))
  }

  /** Sort key reproducing Spark's ORDER BY on the label column for the
    * external types a label realistically is — the argmax tie-break
    * must match the relational spelling's `orderBy(label)`. Strings
    * compare as UTF-8 bytes (UTF8String/DuckDB semantics), NOT Java's
    * UTF-16 code units: the two orders diverge for code points above
    * U+E000 (surrogate pairs sort before U+E000..U+FFFF in UTF-16 but
    * after in UTF-8).
    */
  private val labelOrdering: Ordering[Any] = new Ordering[Any] {
    private def rank(v: Any): Int = v match {
      case _: String => 0
      case _: java.lang.Boolean => 1
      case _: java.lang.Number => 2
      case o => throw new IllegalArgumentException(
        s"unsupported label type: ${o.getClass}")
    }
    override def compare(a: Any, b: Any): Int = {
      val r = Integer.compare(rank(a), rank(b))
      if (r != 0) r
      else (a, b) match {
        case (x: String, y: String) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(x)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
        case (x: java.lang.Boolean, y: java.lang.Boolean) =>
          java.lang.Boolean.compare(x, y)
        case (x: java.lang.Number, y: java.lang.Number)
            if x.isInstanceOf[java.lang.Double] || x.isInstanceOf[java.lang.Float] ||
              y.isInstanceOf[java.lang.Double] || y.isInstanceOf[java.lang.Float] =>
          java.lang.Double.compare(x.doubleValue(), y.doubleValue())
        case (x: java.lang.Number, y: java.lang.Number) =>
          java.lang.Long.compare(x.longValue(), y.longValue())
        case _ => 0
      }
    }
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

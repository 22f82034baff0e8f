package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile-relative filtering: keep rows whose score clears their
  * group's q-quantile — "drop the worst 25% per language" style
  * curation, where an absolute threshold would over-prune one language
  * and under-prune another.
  *
  * Two passes over the data by necessity (the threshold is a function
  * of the full distribution), but the intermediate is only |groups|
  * rows and broadcasts back — the corpus is never shuffled. `exact =
  * false` switches the threshold aggregate to approx_percentile
  * (t-digest sketch, mergeable map-side): at 100 TB the exact
  * percentile buffers every group's values in the aggregate, so the
  * sketch is the right default there; exact mode exists for
  * differential testing and modest corpora.
  */
object QuantileGate {

  def keepAbove(df: DataFrame, groupCol: String, scoreCol: String,
                quantile: Double, exact: Boolean = true): DataFrame = {
    val thrAgg =
      if (exact) percentile(col(scoreCol), lit(quantile))
      else percentile_approx(col(scoreCol), lit(quantile), lit(10000))
    val thr = df.groupBy(col(groupCol))
      .agg(thrAgg.as("__thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }
}

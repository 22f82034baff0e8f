package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the most recent right row
  * with `right.time <= left.time` within the same key (backward
  * direction; the classic market-data/event-enrichment join).
  *
  * SURVEY.md §2.4 lists as-of among the join shapes outside the
  * reference's surface with this exact composition as the recommended
  * Spark realization: tag both sides, UNION, one window sort per key
  * carrying `last(right, ignoreNulls)` forward, keep left rows.
  *
  * Cost model: one shuffle of |L|+|R| rows on the key (the same
  * partitioning a sort-merge join would need) and one in-partition
  * sort — no range-explosion, no per-row subquery. Skew on the key
  * column is the thing to watch at scale; pre-salt hot keys with
  * SkewJoin if needed.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      lookup timeline
    * @param key        equality key column present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  columns of `right` to carry (renamed as given)
    * @param tolerance  optional max age (seconds): matches older than
    *                   `leftTime - tolerance` are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightCols: Map[String, String],
               tolerance: Option[Long] = None): DataFrame = {
    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__rt", lit(null).cast(right.schema(rightTime).dataType))
    val rightTagged = rightCols.foldLeft(
      right.select((key +: rightTime +: rightCols.keys.toSeq).distinct
        .map(col): _*)
        .withColumn("__t", col(rightTime))
        .withColumn("__is_left", lit(0))
        .withColumn("__rt", col(rightTime))) { case (df, _) => df }

    // align schemas for the union
    val leftCols = leftTagged.columns.toSet
    val withNulls = (rightCols.keys.toSeq :+ rightTime)
      .filterNot(leftCols.contains)
      .foldLeft(leftTagged) { (df, c) =>
        df.withColumn(c, lit(null).cast(right.schema(c).dataType))
      }
    val rightAligned = withNulls.columns.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(withNulls.schema(c).dataType))
    }.select(withNulls.columns.map(col): _*)

    // right rows sort BEFORE left rows at equal timestamps → inclusive
    // (right.time <= left.time), matching ASOF JOIN semantics
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(
      withNulls.unionByName(rightAligned)) { case (df, (rc, out)) =>
      df.withColumn(s"__carry_$out", last(col(rc), ignoreNulls = true).over(w))
    }.withColumn("__carry_ts", last(col("__rt"), ignoreNulls = true).over(w))

    val matched = carried.filter(col("__is_left") === 1)
    val aged = tolerance match {
      case Some(sec) => matched.withColumn("__ok",
        col("__carry_ts").isNotNull &&
          unix_timestamp(col("__t")) - unix_timestamp(col("__carry_ts")) <= sec)
      case None => matched.withColumn("__ok", col("__carry_ts").isNotNull)
    }

    val out = rightCols.foldLeft(aged) { case (df, (_, outName)) =>
      df.withColumn(outName,
        when(col("__ok"), col(s"__carry_$outName")).otherwise(lit(null)))
    }
    out.select(left.columns.map(col) ++
      rightCols.values.toSeq.sorted.map(col): _*)
  }
}

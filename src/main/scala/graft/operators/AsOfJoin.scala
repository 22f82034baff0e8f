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
    // the right payload travels as ONE struct (ts + all carried cols):
    // a single last(..., ignoreNulls) then always carries a CONSISTENT
    // right row — per-column carries could skip a NULL value onto an
    // older row while the timestamp tracked the newer one (stale value
    // passing the tolerance check, torn multi-column output)
    val payloadFields = struct(
      col(rightTime).as("__p_ts") +:
        rightCols.keys.toSeq.map(c => col(c).as(s"__p_$c")): _*)
    val rightTagged = right
      .select((key +: rightTime +: rightCols.keys.toSeq).distinct.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__payload", payloadFields)
      .select(col(key), col("__t"), col("__is_left"), col("__payload"))

    val leftTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload",
        lit(null).cast(rightTagged.schema("__payload").dataType))
      .select((left.columns.map(col) :+ col("__t") :+ col("__is_left")
        :+ col("__payload")): _*)

    val rightAligned = left.columns.filterNot(rightTagged.columns.contains)
      .foldLeft(rightTagged) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }.select(leftTagged.columns.map(col): _*)

    // right rows sort BEFORE left rows at equal timestamps → inclusive
    // (right.time <= left.time), matching ASOF JOIN semantics
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftTagged.unionByName(rightAligned)
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val ok = tolerance match {
      case Some(sec) => col("__carry").isNotNull &&
        unix_timestamp(col("__t")) -
          unix_timestamp(col("__carry.__p_ts")) <= sec
      case None => col("__carry").isNotNull
    }
    val out = rightCols.foldLeft(matched.withColumn("__ok", ok)) {
      case (df, (rc, outName)) =>
        df.withColumn(outName,
          when(col("__ok"), col(s"__carry.__p_$rc")).otherwise(lit(null)))
    }
    out.select(left.columns.map(col) ++
      rightCols.values.toSeq.sorted.map(col): _*)
  }
}

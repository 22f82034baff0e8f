package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics of an arbitrary frame in ONE
  * aggregation job — the first thing a pipeline runs against a new
  * 100 TB drop to decide partitioning, skew handling, and dedup keys.
  *
  * Every column's (nulls, distinct, min, max) aggregates ride the same
  * scan; the result is a single row that is then unpivoted driver-free
  * to long format. Exact distinct counts expand the aggregate input
  * |columns|-fold (Spark's multi-count-distinct Expand) — at real
  * scale pass `approxDistinct = true`, which keeps one pass with HLL
  * sketches instead (±2% by default). min/max are emitted as strings
  * so heterogeneous column types share one schema.
  *
  * `hashStrings` keeps distinct counts exact but counts string
  * columns through md5: the Expand row for a document-text column
  * then carries a 32-char digest instead of the document itself —
  * the count is identical short of a 128-bit collision, and the
  * distinct-aggregate shuffle stops scaling with text width. The
  * right default for corpus-text profiling at scale.
  */
object Profile {

  def columnProfile(df: DataFrame,
                    approxDistinct: Boolean = false,
                    hashStrings: Boolean = false): DataFrame = {
    val names = df.schema.fields.map(_.name).toSeq
    // min/max only exist for orderable scalar types; complex columns
    // (array/map/struct/binary) still profile nulls + distincts
    val orderable = df.schema.fields.map { f =>
      import org.apache.spark.sql.types._
      f.name -> (f.dataType match {
        case _: ArrayType | _: MapType | _: StructType | BinaryType => false
        case _ => true
      })
    }.toMap
    val isString = df.schema.fields.map { f =>
      f.name -> (f.dataType == org.apache.spark.sql.types.StringType)
    }.toMap
    def nd(n: String): Column = {
      val c =
        if (hashStrings && isString(n)) md5(col(n)) else col(n)
      if (approxDistinct) approx_count_distinct(c) else count_distinct(c)
    }
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: names.flatMap { n =>
      val (mn, mx) =
        if (orderable(n)) (min(col(n)).cast("string"), max(col(n)).cast("string"))
        else (lit(null).cast("string"), lit(null).cast("string"))
      Seq(
        sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"__nulls_$n"),
        nd(n).as(s"__nd_$n"),
        mn.as(s"__min_$n"),
        mx.as(s"__max_$n"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(names.map(n => struct(
      lit(n).as("column_name"),
      col("__rows").as("n_rows"),
      col(s"__nulls_$n").as("n_nulls"),
      col(s"__nd_$n").as("n_distinct"),
      col(s"__min_$n").as("min_value"),
      col(s"__max_$n").as("max_value"))): _*)).as("__p"))
      .select("__p.*")
  }
}

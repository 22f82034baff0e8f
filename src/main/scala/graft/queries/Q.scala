package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One catalog entry: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * for the driver's differential-correctness gate. `oracle = None` →
  * the driver records a weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false)

/** Shared helpers for oracle-parity numerics.
  *
  * Floating-point SUM/AVG are order-dependent, and Spark (partial
  * aggregation across partitions) will not sum in DuckDB's order. All
  * summed measures therefore go through exact DECIMAL accumulation and
  * are converted to double only once at the end: both engines then emit
  * bit-identical float64. Source values are on a fixed decimal grid
  * (prices/discounts = 2 dp; derived products = 4/6 dp), so the
  * double→decimal cast is error-free on both sides.
  */
object Q {
  def dec(c: Column, scale: Int): Column = c.cast(DecimalType(18, scale))

  /** Scale-adaptive fan-out before a compute-heavy stage (round 18,
    * guide §2.5 "input skew" / §1.2 "the distributed algorithm"): the
    * driver's tables ship as ONE single-row-group parquet file per
    * table, and a parquet row group is the scan's minimum split unit —
    * so every scan-fused stage (decimal aggregation, HLL sketches,
    * count-distinct Expand) runs on ONE core regardless of cluster
    * width (measured: q05's whole 2.5 s was one task's partial
    * aggregate; 31 cores idle). Same discipline as Dedup.fanOut: only
    * when the source arrives with fewer partitions than the cluster
    * can use — at production scale a 100 TB table scans as thousands
    * of row-group splits and this is a structural no-op, so no plan
    * change and no extra exchange is ever paid there.
    *
    * `keys` chooses HASH repartitioning (no map-side sort) over
    * round-robin, which pays a full local sort of every input row for
    * retry determinism (spark.sql.execution.sortBeforeRepartition,
    * guide §2.5) — pass a high-cardinality column; results are
    * value-identical either way because every catalog measure is
    * decimal-exact / order-independent by design (see the header).
    */
  def fanOut(df: DataFrame, keys: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism * 2
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys.map(col): _*)
    else df.repartition(target)
  }

  /** Exact SUM of a 2-dp double measure, emitted as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double")

  /** Exact AVG: double division of two exactly-agreed operands. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(dec(c, scale)).cast("double") / count(c)

  /** Oracle-side spellings of the same. The VARCHAR hop matters at
    * scale: DuckDB casts DECIMAL→DOUBLE as int128→double→÷10^s (two
    * roundings), Spark via BigDecimal (one, correctly rounded). They
    * agree while the scaled integer fits 2^53 and can differ by 1 ulp
    * beyond it — first observed at the local sf1 point where q05's
    * sum_charge×10^6 ≈ 5.2e16. Text→double parses are correctly
    * rounded on both engines, so the hop pins the exact same double.
    */
  def oSum(e: String, scale: Int = 2): String =
    s"CAST(CAST(SUM(CAST($e AS DECIMAL(18,$scale))) AS VARCHAR) AS DOUBLE)"
  def oAvg(e: String, scale: Int = 2): String =
    s"${oSum(e, scale)} / COUNT($e)"
}

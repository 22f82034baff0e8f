package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec

/** Non-vacuity pins for the execution-axis invariance gate.
  *
  * The round-10 invariance recipe re-dumps the whole catalog under
  * execution configs a real cluster moves and diffs values against the
  * baseline dump (`scripts/check_invariance.py`):
  *   - interpreted mode — `spark.sql.codegen.wholeStage=false` +
  *     `spark.sql.codegen.factoryMode=NO_CODEGEN` — pins every custom
  *     Catalyst Expression's `eval` path against its `doGenCode` path
  *     (classic divergence class for hand-written expressions);
  *   - join-strategy independence — `autoBroadcastJoinThreshold=-1` +
  *     `adaptive.enabled=false` — pins results against the
  *     broadcast-vs-shuffle join choice, which is exactly what a
  *     1000-executor cluster's statistics flip at runtime;
  *   - non-vectorized parquet (`enableVectorizedReader=false`) — pins
  *     the row-by-row parquet read path against the columnar one;
  *   - Kryo (`spark.serializer`) — core conf, JVM-wide, so its dump is
  *     recipe-only (a forked-JVM pin would buy little: builder-time
  *     core confs don't silently no-op the way renamed SQL confs can);
  *   - speculative execution (round 11, the fifth axis) — its bite can
  *     only exist on a multi-host master (Spark never schedules a
  *     speculative copy on the running attempt's host), so its
  *     non-vacuity pins live where the hosts are: `graft.Verify` exits
  *     nonzero if a speculation-flagged dump launched zero attempts,
  *     and `SpeculativePublishSpec` requires a launched AND completed
  *     duplicate inside the publish write job.
  *
  * That gate is only as good as the configs actually biting, so this
  * suite pins the bite: the flipped session's executed plan must LOSE
  * the WholeStageCodegen / BroadcastHashJoin nodes the baseline plan
  * has, and the values must still agree. A Spark upgrade that renames
  * or ignores either conf fails here, not silently in the recipe.
  */
class ExecAxisSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def entry(s: SparkSession, name: String): DataFrame =
    graft.queries.Catalog.all.find(_.name == name)
      .getOrElse(sys.error(s"no catalog entry $name")).run(s, sf)

  /** Execute and return (final physical plan string, canonical rows). */
  private def run(s: SparkSession, name: String): (String, Seq[String]) = {
    val df = entry(s, name)
    val rows = df.collect().map(_.toString).toSeq.sorted
    (df.queryExecution.executedPlan.toString, rows)
  }

  private def flipped(confs: (String, String)*): SparkSession = {
    val s2 = spark.newSession()
    confs.foreach { case (k, v) => s2.conf.set(k, v) }
    s2
  }

  test("interpreted mode really disables whole-stage codegen, same values") {
    val (basePlan, baseRows) = run(spark, "q05_groupby_pricing")
    val s2 = flipped(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val (flipPlan, flipRows) = run(s2, "q05_groupby_pricing")
    // whole-stage codegen prints as a `*(n) ` node prefix in the final
    // plan string (the literal WholeStageCodegen node name only appears
    // in explain("formatted"))
    assert(basePlan.contains("*(1)"),
      s"baseline plan lost codegen — axis baseline is broken:\n$basePlan")
    assert(!flipPlan.contains("*(1)"),
      s"flipped session still codegens — conf no longer bites:\n$flipPlan")
    assert(baseRows == flipRows)
  }

  test("custom-Expression entry: eval path == codegen path") {
    // d02 runs the TextSketches token kernels — custom Expressions with
    // hand-written doGenCode; this is the pair the axis exists for.
    val (_, baseRows) = run(spark, "d02_token_count")
    val s2 = flipped(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val (_, flipRows) = run(s2, "d02_token_count")
    assert(baseRows == flipRows)
  }

  test("vectorized-reader=off really changes the scan path, same values") {
    val (basePlan, baseRows) = run(spark, "q06_where_filter")
    val s2 = flipped("spark.sql.parquet.enableVectorizedReader" -> "false")
    val (flipPlan, flipRows) = run(s2, "q06_where_filter")
    assert(basePlan.contains("Batched: true"),
      s"baseline scan is not vectorized — axis baseline is broken:\n$basePlan")
    assert(flipPlan.contains("Batched: false"),
      s"flipped session still vectorizes — conf no longer bites:\n$flipPlan")
    assert(baseRows == flipRows)
  }

  test("broadcast-threshold=-1 really forces a shuffle join, same values") {
    val (basePlan, baseRows) = run(spark, "q12_join_agg")
    val s2 = flipped(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val (flipPlan, flipRows) = run(s2, "q12_join_agg")
    assert(basePlan.contains("BroadcastHashJoin"),
      s"baseline no longer broadcasts q12's dim side:\n$basePlan")
    assert(!flipPlan.contains("BroadcastHashJoin"),
      s"threshold=-1 ignored — conf no longer bites:\n$flipPlan")
    assert(flipPlan.contains("SortMergeJoin") ||
      flipPlan.contains("ShuffledHashJoin"))
    assert(baseRows == flipRows)
  }
}

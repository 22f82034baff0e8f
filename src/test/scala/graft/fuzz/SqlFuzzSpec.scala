package graft.fuzz

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.Tables
import graft.validate.QueryValidator

/** Grammar-fuzz of the admitted SQL surface (VERDICT r6 #3): generate
  * random SELECTs from the validator's de facto dialect, check every
  * one is actually admitted, execute on Spark, and dump result +
  * statement for the DuckDB half of the differential gate
  * (`scripts/check_fuzz.py <out> <sf>` replays the same text in DuckDB
  * and value-compares).
  *
  * Env knobs: SPARK_GRAFT_FUZZ_N (statements, default 200),
  * SPARK_GRAFT_FUZZ_SEED (default 42 — vary per run for fresh
  * coverage), SPARK_GRAFT_FUZZ_SF (default sf0.01),
  * SPARK_GRAFT_FUZZ_OUT (default /tmp/sqlfuzz).
  */
class SqlFuzzSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SF",
    "/root/testdata/sf0.01")
  private val outDir = sys.env.getOrElse("SPARK_GRAFT_FUZZ_OUT",
    "/tmp/sqlfuzz")
  private val n = sys.env.getOrElse("SPARK_GRAFT_FUZZ_N", "200").toInt
  private val seed0 = sys.env.getOrElse("SPARK_GRAFT_FUZZ_SEED", "42").toLong

  /** Literal pools from the actual data: distinct values for strings,
    * quantile pivots for numerics — predicates then hit realistic
    * selectivities at any SF.
    */
  private def samplePools(): SqlFuzz.Pools = {
    val strs = Map.newBuilder[String, Seq[String]]
    val nums = Map.newBuilder[String, Seq[String]]
    val times = Map.newBuilder[String, Seq[String]]
    SqlFuzz.tables.foreach { t =>
      val df = spark.table(t.name)
      val strCols = t.cols.filter(_.typ == "string").map(_.name)
      val numCols = t.cols.filter(c => c.typ != "string" && c.typ != "ts")
      val tsCols = t.cols.filter(_.typ == "ts").map(_.name)
      strCols.foreach { c =>
        val vs = df.select(c).distinct().orderBy(c).limit(8)
          .collect().map(_.getString(0)).toSeq
        if (vs.nonEmpty) strs += c -> vs
      }
      if (numCols.nonEmpty) {
        val qs = df.stat.approxQuantile(
          numCols.map(_.name).toArray, Array(0.1, 0.5, 0.9), 0.05)
        numCols.zip(qs).foreach { case (c, pivots) =>
          val rendered = pivots.toSeq.map { v =>
            if (c.typ == "double") f"$v%.2f" else v.toLong.toString
          }.distinct
          if (rendered.nonEmpty) nums += c.name -> rendered
        }
      }
      tsCols.foreach { c =>
        // cast handles both vintages (TimestampType and NTZ) uniformly
        val qs = df.select(unix_micros(col(c).cast("timestamp"))
            .cast("double").as("u"))
          .stat.approxQuantile("u", Array(0.1, 0.5, 0.9), 0.05)
        val fmt = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")
          .withZone(java.time.ZoneOffset.UTC)
        val rendered = qs.toSeq.map(v => fmt.format(
          java.time.Instant.ofEpochSecond((v / 1e6).toLong))).distinct
        if (rendered.nonEmpty) times += c -> rendered
      }
    }
    SqlFuzz.Pools(strs.result(), nums.result(), times.result())
  }

  test("pinned dialect divergence: grouping sets over empty input omit the grand-total row") {
    // The SQL standard (DuckDB, Postgres) says CUBE/ROLLUP's empty
    // grouping set over ZERO input rows still emits the grand-total
    // row (COUNTs 0, keys NULL, GROUPING flags 1) — like a global
    // aggregate. Spark expands rows BEFORE aggregating, so zero rows
    // in means zero groups out. check_fuzz.py recognizes exactly this
    // shape as PINNED; this test fails the day a Spark upgrade makes
    // the behavior standard, which is the signal to drop that pin.
    Tables.registerAll(spark, sfDir)
    val cube = spark.sql("SELECT r_regionkey, COUNT(*) AS agg0 FROM " +
      "region WHERE r_regionkey < 0 GROUP BY CUBE(r_regionkey)")
    assert(cube.count() == 0,
      "Spark now emits grouping-set rows over empty input — remove the " +
        "pinned_empty_grouping_sets carve-out in scripts/check_fuzz.py")
    // the same query over a non-empty input has NO divergence (the
    // grand-total row exists in both engines) — the pin is empty-only
    val nonEmpty = spark.sql("SELECT r_regionkey, COUNT(*) AS agg0 " +
      "FROM region GROUP BY CUBE(r_regionkey)")
    assert(nonEmpty.count() == 6) // 5 regions + grand total
  }

  test(s"$n generated admitted statements execute on Spark (dump for DuckDB gate)") {
    Tables.registerAll(spark, sfDir)
    val pools = samplePools()
    val gen: Gen[String] = SqlFuzz.statement(pools)
    val params = Gen.Parameters.default

    val out = new java.io.File(outDir)
    if (out.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(out)
    }
    out.mkdirs()

    var admitted = 0
    var rejected = 0
    val manifest = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0L
    while (admitted < n) {
      val sql = gen.pureApply(params, Seed(seed0 + i), retries = 100)
      i += 1
      val v = QueryValidator.validate(sql)
      if (!v.valid) {
        // the only expected reject class: a scalar-agg whose first
        // token is CAST(, which prefix-matches no whitelist shape —
        // the generator emits the de facto surface, the validator
        // decides; anything else rejected is a generator bug
        assert(sql.startsWith("SELECT CAST(") || sql.startsWith("SELECT ("),
          s"unexpectedly rejected: $sql — ${v.error}")
        rejected += 1
      } else {
        val name = f"f$admitted%04d"
        val res = spark.sql(sql)
        res.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        manifest += name -> sql
        admitted += 1
      }
    }
    val json = manifest.map { case (k, s) =>
      val esc = s.replace("\\", "\\\\").replace("\"", "\\\"")
      s""""$k": "$esc""""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/fuzz_sql.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    info(s"admitted $admitted, rejected $rejected (CAST-prefix scalar aggs)")
    assert(admitted == n)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the e08 sf1 bimodality question (round-14 verdict
  * task 3): BENCH sf1 draws for e08_semantic_dedup on byte-identical
  * code have landed in two bands across rounds ([2.4, 2.8] vs
  * [5.6, 5.9]). The round-13 notes HYPOTHESIZED JVM-state noise
  * (GC/JIT/codegen-cache pressure after the full sf0.1 sweep that
  * precedes the sf1 section in Bench). This probe turns the hypothesis
  * into a measurement:
  *
  *   arm "solo":  fresh JVM → warm e08@sf1 → N timed draws
  *   arm "sweep": fresh JVM → one full sf0.1 catalog sweep (exactly
  *                what Bench runs before the sf1 section) → warm
  *                e08@sf1 → N timed draws
  *
  * If the high band appears only under "sweep", the bimodality is
  * ordering-dependent JVM state, confirming the notes. If "solo" also
  * draws both bands, the cause is external (co-tenant) or intrinsic —
  * file as a finding instead.
  *
  * Run (fresh JVM per arm — that IS the experiment):
  *   java <add-opens> -cp "<test-classes>:<classes>:<spark jars glob>"
  *     graft.tools.E08AbProbe solo|sweep <sf01Dir> <sf1Dir> [draws]
  * Prints one JSON line {"arm":…,"draws":[…]}.
  */
object E08AbProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: E08AbProbe solo|sweep <sf01Dir> <sf1Dir> [draws]")
    val Array(arm, sf01, sf1) = args.take(3)
    val draws = if (args.length > 3) args(3).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      // identical static confs to graft.Bench — the codegen cache size
      // is load-bearing for the "sweep" arm (Bench sets it too)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.shuffle.partitions", cpus)
      // SPARK_GRAFT_AQE=false isolates whether AQE's runtime re-plans
      // are the per-draw flipper (same override Bench honors)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra static confs for hypothesis isolation, Verify's k=v;k=v shape
    sys.env.get("SPARK_GRAFT_PROBE_CONFS").foreach {
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROBE_PLANS=<dir>: dump every query's FINAL adaptive
    // plan, filename carrying the wall duration — diff a slow draw's
    // plan against a fast one to see which AQE decision flipped
    sys.env.get("SPARK_GRAFT_PROBE_PLANS").foreach { dir =>
      new java.io.File(dir).mkdirs()
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val f = s"$dir/plan_${durationNs / 1000000}ms_${System.nanoTime()}.txt"
            java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
              qe.executedPlan.toString)
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    }

    def exec(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    if (arm == "sweep")
      graft.queries.Catalog.all.map(_.name).foreach { n =>
        try exec(sf01, n)
        catch { case e: Throwable =>
          System.err.println(s"[e08ab] sweep $n failed: ${e.getMessage}") }
      }
    exec(sf1, "e08_semantic_dedup") // warm (page cache + codegen), both arms
    val times = (1 to draws).map(_ => exec(sf1, "e08_semantic_dedup"))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"arm":"$arm","draws":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
  }
}

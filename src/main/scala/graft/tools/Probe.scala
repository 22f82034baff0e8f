package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch perf probe (dev tool, not part of the driver contract):
  * runs the named catalog entries against SPARK_GRAFT_SF_DIR with the
  * bench harness's session shape and prints warm + per-run timings.
  *
  *   sbt "runMain graft.tools.Probe t01_stream_hourly d12_curation"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PROBE_COUNT=1 swaps the noop sink for count() and
    // prints result cardinality — a sanity check that repeated draws
    // of stateful/streaming entries really re-execute the pipeline
    val doCount = sys.env.get("SPARK_GRAFT_PROBE_COUNT").contains("1")
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (doCount) {
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe]   $name rows=$n")
        dt
      } else {
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    }
    args.foreach { name =>
      val warm = exec(name)
      val timed = Seq.fill(runs)(exec(name))
      println(f"[probe] $name warm=$warm%.2f timed=" +
        timed.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}

package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** One-JVM interleaved A/B of the two bench forcing mechanisms
  * (round 17): the noop-DataFrameWriter sink `graft.Bench` used through
  * round 16 vs the whole-plan toRdd job it uses now. The switch exists
  * so every draw can read its final adaptive plan; this probe exists so
  * the cross-round comparability claim ("like-for-like") is a measured
  * number, not an assumption. Interleaving (noop, toRdd, toRdd, noop
  * per entry per pass) makes the comparison robust to the host's
  * minute-scale co-tenant bursts — both mechanisms sample the same
  * load.
  *
  * Run: java -cp "<test-classes>:<classes>:<spark jars>"
  *   graft.tools.BenchAbProbe <sfDir> [passes]
  * Prints per-mechanism totals (min over passes per entry, summed) and
  * the per-entry ratio tails.
  */
object BenchAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def rdd(name: String): Double = {
      val t0 = System.nanoTime()
      val qe = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
      spark.sparkContext.runJob(qe.toRdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) => {
          while (it.hasNext) it.next(); ()
        })
      (System.nanoTime() - t0) / 1e9
    }

    val names = graft.queries.Catalog.all.map(_.name)
    names.foreach(rdd); names.foreach(noop) // warm both paths
    val nT = collection.mutable.Map.empty[String, Double].withDefaultValue(1e9)
    val rT = collection.mutable.Map.empty[String, Double].withDefaultValue(1e9)
    for (p <- 1 to passes; n <- names) {
      // alternate which mechanism goes first so neither always pays
      // the cache-cold / burst-entry cost
      if (p % 2 == 1) {
        nT(n) = math.min(nT(n), noop(n)); rT(n) = math.min(rT(n), rdd(n))
      } else {
        rT(n) = math.min(rT(n), rdd(n)); nT(n) = math.min(nT(n), noop(n))
      }
    }
    val totalN = names.map(nT).sum
    val totalR = names.map(rT).sum
    def f(v: Double) = String.format(Locale.ROOT, "%.3f", v)
    val ratios = names.map(n => n -> rT(n) / math.max(nT(n), 1e-9))
      .sortBy(-_._2)
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(s"""{"noop_total":${f(totalN)},"toRdd_total":${f(totalR)},"ratio":${
      f(totalR / totalN)},"worst":[${
      ratios.take(5).map { case (n, r) => s""""$n":${f(r)}""" }.mkString(",")
      }],"best":[${
      ratios.takeRight(5).map { case (n, r) => s""""$n":${f(r)}""" }.mkString(",")}]}""")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for SemDeDup cell sizing at a large corpus (dev tool, not
  * part of the driver contract): fixed k=16 (the oracle-pinned e08
  * gate shape, pair work ∝ N²/k) vs the auto-k default (k = N /
  * targetCellSize — the paper's k ∝ N discipline, pair work linear).
  * Round-robin timed draws, min per variant.
  *
  *   SPARK_GRAFT_SF_DIR=localdata/sf10 sbt "runMain graft.tools.SemDedupProbe"
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "localdata/sf10")
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

    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()

    def run(nCells: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.SemDedup.verdicts(emb, "vec_id", "embedding",
        threshold = 0.3, nCells = nCells, iterations = 1)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val variants = Seq("fixed_k16" -> 16, "auto_k" -> -1)
    variants.foreach { case (_, k) => run(k) } // warm
    val draws = scala.collection.mutable.Map(
      variants.map { case (l, _) => l -> Vector.empty[Double] }: _*)
    for (_ <- 1 to runs; (l, k) <- variants)
      draws(l) = draws(l) :+ run(k)

    println(s"[semdedup-probe] sf=$sfDir n=$n runs=$runs")
    variants.foreach { case (l, _) =>
      val d = draws(l)
      println(f"[semdedup-probe] $l%-10s min=${d.min}%.2f s draws=" +
        d.map(v => f"$v%.2f").mkString(","))
    }
  }
}

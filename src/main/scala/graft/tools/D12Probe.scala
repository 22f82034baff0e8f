package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** One-off A/B probe for the d12 entry plumbing (dev tool, not part of
  * the driver contract). Variants, each run to a noop-write action:
  *
  *  A  current entry: curateManaged -> select -> localCheckpoint(true)
  *     -> release -> orderBy   (checkpoint pays an extra materialize
  *     job but lets the persist be released before returning)
  *  B  release-after-action: curateManaged -> select -> orderBy ->
  *     action -> release. NOT shippable through the entry signature
  *     (the release obligation would outlive the call = the leak
  *     class); measured only to price what the checkpoint costs vs
  *     the unreachable ideal.
  *  C  as A but localCheckpoint(eager, MEMORY_AND_DISK_SER) —
  *     serialized checkpoint blocks (less memory, more CPU).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.D12Probe"
  */
object D12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def managed(): (DataFrame, () => Unit) = {
      val docs = graft.core.Tables.load(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism * 2)
      graft.operators.Curation.curateManaged(
        docs, "doc_id", "text",
        minQuality = 0.3, nearDupThreshold = 0.5)
    }

    def act(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def variantA(): Unit = {
      val (cur, release) = managed()
      val out = cur.select("doc_id", "lang", "n_chars").localCheckpoint(true)
      release()
      act(out.orderBy("doc_id"))
    }
    def variantB(): Unit = {
      val (cur, release) = managed()
      act(cur.select("doc_id", "lang", "n_chars").orderBy("doc_id"))
      release()
    }
    def variantC(): Unit = {
      val (cur, release) = managed()
      val out = cur.select("doc_id", "lang", "n_chars")
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      release()
      act(out.orderBy("doc_id"))
    }

    val variants = Seq("A_checkpoint" -> (() => variantA()),
      "B_release_after" -> (() => variantB()),
      "C_checkpoint_ser" -> (() => variantC()))
    // warm one full draw, then round-robin timed draws (anti-burst)
    variants.foreach(_._2())
    val times = collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to runs; (name, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      times(name) :+= (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"[d12probe] $name%-16s min=${ts.min}%.2f med=${ts.sorted.apply(ts.size / 2)}%.2f draws=" +
        ts.map(t => f"$t%.2f").mkString(","))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.operators.Curation

/** Scratch perf probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      val docs = Tables.load(spark, d, "documents").repartition(64)
      val out = Curation.curate(docs, "doc_id", "text",
        minQuality = 0.3, nearDupThreshold = 0.5)
      time(s"curate run$i")(println("[probe] survivors " + out.count()))
    }
    spark.stop()
  }
}

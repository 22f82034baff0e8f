package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.operators.Dedup

/** Scratch perf probe (dev tool, not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { d =>
      val docs = Tables.load(spark, d, "documents")
      val out = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleWords = 3, numHashes = 32, bands = 8, threshold = 0.5)
      time(s"minhashNearDups $d")(println("[probe] pairs " + out.count()))
    }
    spark.stop()
  }
}

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
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
         h <- Seq(3, 6, 12)) {
      val docs = Tables.load(spark, d, "documents")
      val n = Dedup.simhashNearDups(docs, "doc_id", "text",
        bands = 4, maxHamming = h).count()
      println(s"[probe] $d hamming<=$h pairs=$n")
    }
    spark.stop()
  }
}

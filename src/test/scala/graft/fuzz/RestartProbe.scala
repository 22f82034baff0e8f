package graft.fuzz

import java.nio.file._

import scala.jdk.CollectionConverters._

import org.apache.spark.sql._
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Dev probe: minimal stop/restart replay with checkpoint listing. */
object RestartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("probe").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = 1700000000L * 1000000L
    def ev(id: Long, sec: Long) =
      StreamFuzz.Ev(id, base + sec * 1000000L, 1L, "view", 1.0, "{}")
    val sc0 = StreamFuzz.Scenario(0L, 0, "windowed-late", 600L, Vector(
      Vector(ev(1, 10000)), Vector(ev(2, 20000)), Vector(ev(3, 30000)),
      Vector(ev(4, 12000))))
    val full = StreamFuzz.stage(spark, sc0)
    val live = Files.createTempDirectory("probe-live")
    val ckpt = Files.createTempDirectory("probe-ckpt")
    val files = StreamFuzz.listDir(full).sortBy(_.getFileName.toString)
    val (pre, post) = files.splitAt(3)
    def moveIn(fs: Vector[Path]): Unit = fs.foreach { f =>
      val t = Files.getLastModifiedTime(f)
      val d = live.resolve(f.getFileName)
      Files.move(f, d); Files.setLastModifiedTime(d, t)
    }
    val fn: (Dataset[Row], Long) => Unit =
      (b, id) => println(s"BATCH $id rows=${b.count()}")
    def runOnce(): Unit = {
      val events = EventStream.readEvents(spark, live.toString,
        options = Map("maxFilesPerTrigger" -> "1"))
      val q = EventStream.windowedAgg(events, "1 hour",
          lateness = "600 seconds")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt.toString).foreachBatch(fn).start()
      try q.processAllAvailable() finally q.stop()
    }
    moveIn(pre)
    runOnce()
    println("=== offset metadata after run1 ===")
    def dumpOffsets(): Unit = StreamFuzz.listDir(ckpt.resolve("offsets"))
      .filter(_.getFileName.toString.matches("\\d+"))
      .sortBy(_.getFileName.toString.toLong)
      .foreach { p =>
        val wm = Files.readAllLines(p).asScala
          .find(_.contains("batchWatermarkMs")).getOrElse("?")
        println(s"offsets/${p.getFileName}: $wm")
      }
    dumpOffsets()
    moveIn(post)
    runOnce()
    println("=== offset metadata after run2 ===")
    dumpOffsets()
    println("=== done run2 ===")
    spark.stop()
  }
}

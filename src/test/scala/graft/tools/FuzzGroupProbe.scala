package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.fuzz.StreamFuzz
import graft.streaming.EventStream

/** Dev probe: dissect one StreamFuzz scenario under multi-file
  * triggers — prints the raw/grouped batch placement of a key, the
  * per-batch watermark the ENGINE reports (progress events), and the
  * emitted multiset, to check the grouped oracle's alignment against
  * the engine's actual file grouping.
  *
  * usage: FuzzGroupProbe <seed> <idx> <k> [keyOfInterest]
  */
object FuzzGroupProbe {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val idx = args(1).toInt
    val k = args(2).toInt
    val key = if (args.length > 3) args(3).toLong else -1L
    val sc = StreamFuzz.scenario(seed, idx)
    println(s"kind=${sc.kind} lateness=${sc.latenessSec}s " +
      s"rawBatches=${sc.batches.size} sizes=${sc.batches.map(_.size)}")
    val g = StreamFuzz.grouped(sc, k)
    println(s"grouped sizes=${g.batches.map(_.size)}")
    val wms = StreamFuzz.activeWatermarks(g)
    println(s"grouped activeWms=${wms.map(_ / 1000000L)}")
    if (key >= 0) {
      sc.batches.zipWithIndex.foreach { case (b, i) =>
        b.filter(_.eventId == key).foreach(e =>
          println(s"  raw batch $i: key=$key ts=${e.tsUs / 1000000L}"))
      }
      g.batches.zipWithIndex.foreach { case (b, i) =>
        b.filter(_.eventId == key).foreach(e =>
          println(s"  grouped batch $i: key=$key ts=${e.tsUs / 1000000L} " +
            s"admitted=${e.tsUs >= wms(i)} " +
            s"expiryAt=${(e.tsUs + sc.latenessSec * 1000000L) / 1000000L}"))
      }
      println(s"possibleCounts(key)=" +
        StreamFuzz.dedupLatePossibleCounts(g).get(key))
    }

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryProgressEvent): Unit =
          progress += s"batch=${e.progress.batchId} rows=${e.progress
            .numInputRows} wm=${e.progress.eventTime.get("watermark")}"
        override def onQueryTerminated(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val dir = StreamFuzz.stage(spark, sc)
    try {
      val rows = StreamFuzz.replay(spark, dir, "probe", ev =>
          EventStream.dedupStream(ev, Seq("event_id"),
            lateness = s"${sc.latenessSec} seconds"),
          filesPerTrigger = k)
        .filter(col("event_id") >= 0)
        .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq
      Thread.sleep(1000)
      progress.foreach(println)
      val counts = rows.groupBy(identity).view.mapValues(_.size).toMap
      println(s"emitted=${rows.size} distinct=${counts.size}")
      if (key >= 0) println(s"engineCount(key)=${counts.getOrElse(key, 0)}")
      val want = StreamFuzz.dedupLateOracle(g)
      println(s"exactOracle size=${want.size}")
    } finally StreamFuzz.cleanup(dir)
    spark.stop()
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** Round 18 (r17 verdict task 5): the per-microbatch progress dump
  * must cover EVERY batch of a replay, not the last
  * spark.sql.streaming.numRecentProgressUpdates (default 100) — the
  * r17 implementation read q.recentProgress, which silently drops the
  * HEAD of the state trajectory on a >100-batch replay, i.e. exactly
  * the early batches where an eviction regression first shows. The
  * dump now collects via a StreamingQueryListener; this spec drives a
  * 110-micro-batch replay (one file per trigger) and asserts the dump
  * contains all 110 batch ids including batch 0.
  */
class ProgressDumpSpec extends SparkSpec {

  test("progress dump covers every micro-batch past the recentProgress cap") {
    val nBatches = 110
    val src = Files.createTempDirectory("graft-progress-src-")
    (0 until nBatches).foreach { i =>
      Files.writeString(src.resolve(f"f$i%03d.json"), s"""{"v":$i}""" + "\n")
    }
    val dump = Files.createTempDirectory("graft-progress-dump-")
    val schema = StructType(Seq(StructField("v", LongType)))
    val df = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(src.toString)
    // sys.props arm of the hook (env vars can't be set in-process)
    sys.props("SPARK_GRAFT_STREAM_PROGRESS") = dump.toString
    try EventStream.runToMemory(df, "progress_dump_probe")
    finally { sys.props.remove("SPARK_GRAFT_STREAM_PROGRESS"); () }

    assert(spark.table("progress_dump_probe").count() == nBatches)
    val dumpFile = Files.list(dump).toArray.map(_.toString)
      .filter(_.contains("progress_dump_probe"))
    assert(dumpFile.length == 1,
      s"expected exactly one dump file, found ${dumpFile.mkString(", ")}")
    val text = Files.readString(java.nio.file.Paths.get(dumpFile.head))
    val batchIds = """"batchId"\s*:\s*(\d+)""".r
      .findAllMatchIn(text).map(_.group(1).toLong).toVector
    // every data batch must be present — the old recentProgress dump
    // tops out at 100 entries and loses batch 0 first
    assert(batchIds.distinct.size >= nBatches,
      s"dump carries ${batchIds.distinct.size} distinct batch ids, " +
        s"expected >= $nBatches — the head of the trajectory was dropped")
    assert(batchIds.min == 0L,
      s"batch 0 missing from the dump (min=${batchIds.min}) — head truncated")
  }
}

package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def chunksOf(text: String, w: Int, stride: Int) = {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    Chunking.slidingWindows(docs, "doc_id", "text", w, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
  }

  test("overlapping windows cover every token and overlap by w - stride") {
    // 7 tokens, window 4, stride 2 -> starts 0, 2, 4, 6
    val out = chunksOf("t0 t1 t2 t3 t4 t5 t6", w = 4, stride = 2)
    assert(out.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 3L), (3L, 6L, 1L)))
    assert(out(0)._4 == md5hex("t0 t1 t2 t3"))
    assert(out(1)._4 == md5hex("t2 t3 t4 t5"))
    assert(out(2)._4 == md5hex("t4 t5 t6"))
    assert(out(3)._4 == md5hex("t6"))
  }

  test("a document shorter than one window is a single chunk") {
    val out = chunksOf("only two", w = 64, stride = 48)
    assert(out.toSeq == Seq((0L, 0L, 2L, md5hex("only two"))))
  }

  test("exact multiples produce no empty trailing chunk") {
    // 4 tokens, window 2, stride 2 -> exactly 2 chunks
    val out = chunksOf("a b c d", w = 2, stride = 2)
    assert(out.map(c => (c._2, c._3)).toSeq == Seq((0L, 2L), (2L, 2L)))
  }

  test("empty documents emit no chunks") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val out = Chunking.slidingWindows(docs, "doc_id", "text")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L))
  }

  test("chunking plans no shuffle") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.slidingWindows(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}

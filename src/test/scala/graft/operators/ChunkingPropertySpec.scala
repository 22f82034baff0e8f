package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property tests of the sliding-window chunker's coverage contract:
  * window starts march every `stride` tokens, every token lands in at
  * least one chunk, and chunk shapes are exactly determined by
  * (n, window, stride).
  */
class ChunkingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val params: Gen[(Int, Int, Int)] = for {
    n <- Gen.choose(0, 120)       // token count
    w <- Gen.choose(1, 20)        // window
    s <- Gen.choose(1, 20)        // stride
  } yield (n, w, s)

  test("chunks cover every token, start on stride marks, and match the closed form") {
    check(Prop.forAll(params) { case (n, w, s) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val out = Chunking.slidingWindows(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", w, s)
        .orderBy("chunk_idx")
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      val expectedChunks = if (n == 0) 0 else math.ceil(n.toDouble / s).toInt
      val countOk = out.length == expectedChunks
      val startsOk = out.zipWithIndex.forall { case ((idx, start, _), i) =>
        idx == i.toLong && start == (i.toLong * s)
      }
      val lensOk = out.forall { case (_, start, len) =>
        len == math.min(w.toLong, n - start) && len > 0
      }
      // with stride <= window every token is inside some chunk
      val coverageOk = s > w || n == 0 ||
        (0 until n).forall(t => out.exists { case (_, start, len) =>
          t >= start && t < start + len
        })
      countOk && startsOk && lensOk && coverageOk
    })
  }
}

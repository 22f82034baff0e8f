package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docs = Seq(
    (1L, "aa bb cc dd"), // "aa bb" shared, "cc dd" unique
    (2L, "aa bb xx yy"),
    (3L, "aa bb zz"),    // straddling last chunk ("zz")
    (4L, "aa bb"),       // nothing survives
    (5L, "")             // no tokens at all
  ).toDF("doc_id", "text")

  private lazy val out = Boilerplate
    .dropRepeatedChunks(docs, "doc_id", "text", chunkTokens = 2, maxDocs = 1)
    .collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("chunks repeated in more than maxDocs docs are dropped everywhere") {
    assert(out(1L) == ((2L, 1L, md5hex("cc dd"))))
    assert(out(2L) == ((2L, 1L, md5hex("xx yy"))))
    assert(out(3L) == ((2L, 1L, md5hex("zz"))))
  }

  test("documents reduced to nothing still appear with an empty fingerprint") {
    assert(out(4L) == ((1L, 0L, md5hex(""))))
    assert(out(5L) == ((0L, 0L, md5hex(""))))
  }

  test("reassembly preserves chunk order") {
    val d = Seq((1L, "k1 k2 u1 u2 k3 k4 u3"), (2L, "k1 k2 x x k3 k4"),
      (3L, "k1 k2 y y k3 k4")).toDF("doc_id", "text")
    val r = Boilerplate.dropRepeatedChunks(d, "doc_id", "text",
      chunkTokens = 2, maxDocs = 2)
    // every chunk appears in <= 2 docs except "k1 k2" and "k3 k4"
    val m = r.collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(m(1L) == md5hex("u1 u2 u3"))
  }

  test("the tokenizer is not inlined into the per-chunk lambda") {
    val plan = Boilerplate.dropRepeatedChunks(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the tokenize chain (filter(split(lower(text)))) must be projected
    // once per row, not re-evaluated inside the per-chunk slice lambda
    // (HOF lambdas re-run captured subtrees per element)
    assert(!plan.contains("slice(filter(split("),
      s"tokenizer inlined into the chunk lambda:\n$plan")
  }
}

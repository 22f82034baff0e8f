package graft.operators

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target-only vocabulary: "good nice"; raw-only: "spam junk"
  private lazy val docs = Seq(
    (1L, "en", "good nice good"),
    (2L, "en", "good text here"),
    (3L, "xx", "spam junk spam junk"),
    (4L, "xx", "good spam"),
    (5L, "xx", "")
  ).toDF("doc_id", "lang", "text")

  private lazy val scored = Dsir.score(docs,
    docs.filter($"lang" === "en"), "doc_id", "text", numBuckets = 64)
    .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("every raw document is scored; token counts are occurrence counts") {
    assert(scored.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(scored(1L)._1 == 3L)
    assert(scored(3L)._1 == 4L)
  }

  test("target-like documents outscore off-target ones") {
    assert(scored(1L)._2 > scored(3L)._2)
    // mixed doc sits between pure-target and pure-raw
    assert(scored(4L)._2 > scored(3L)._2)
    assert(scored(4L)._2 < scored(1L)._2)
  }

  test("empty documents score zero") {
    assert(scored(5L) == ((0L, 0.0)))
  }

  test("gumbel resampling is deterministic and bounded by k") {
    val scoredDf = Dsir.score(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", numBuckets = 64)
    val a = Dsir.gumbelTopK(scoredDf, "doc_id", "dsir_score", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Dsir.gumbelTopK(scoredDf.repartition(5), "doc_id", "dsir_score",
      k = 3).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "hash-derived noise must not depend on partitioning")
    assert(a.length == 3)
  }

  test("tau -> 0 degenerates to top-by-score") {
    val scoredDf = Dsir.score(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", numBuckets = 64)
    val byScore = scoredDf.orderBy($"dsir_score".desc, $"doc_id")
      .select("doc_id").collect().map(_.getLong(0)).take(2).toSeq
    val sampled = Dsir.gumbelTopK(scoredDf, "doc_id", "dsir_score",
      k = 2, tau = 1e-9).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sampled.toSet == byScore.toSet)
  }

  test("scores match a direct per-token computation") {
    // numBuckets = 64 and a tiny vocabulary: collisions are possible
    // but the reference below uses the same bucketing, so the check is
    // exact regardless
    val toks = Map(
      1L -> Seq("good", "nice", "good"),
      2L -> Seq("good", "text", "here"),
      3L -> Seq("spam", "junk", "spam", "junk"),
      4L -> Seq("good", "spam"),
      5L -> Seq.empty[String])
    def bucket(t: String): Long =
      graft.functions.TextSketches.minhashMixers(1) match {
        case _ => // reuse the kernel's hash via a throwaway frame
          Seq(t).toDF("t")
            .select(graft.functions.TextSketches.fnv64($"t")
              .bitwiseAND(63L)).head().getLong(0)
      }
    val buckets = toks.values.flatten.toSeq.distinct.map(t => t -> bucket(t)).toMap
    val rawCounts = toks.values.flatten.toSeq.groupBy(buckets)
      .map { case (b, ts) => b -> ts.size.toLong }
    val tgtToks = toks.filterKeys(Set(1L, 2L)).values.flatten.toSeq
    val tgtCounts = tgtToks.groupBy(buckets).map { case (b, ts) => b -> ts.size.toLong }
    val bigR = rawCounts.values.sum
    val bigT = tgtToks.size.toLong
    def weight(b: Long): java.math.BigDecimal = {
      val w = math.log((tgtCounts.getOrElse(b, 0L) + 1).toDouble / (bigT + 64)) -
        math.log((rawCounts(b) + 1).toDouble / (bigR + 64))
      new java.math.BigDecimal(w)
        .setScale(9, java.math.RoundingMode.HALF_UP)
    }
    for ((id, ts) <- toks if ts.nonEmpty) {
      val exp = ts.map(t => weight(buckets(t)))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        .doubleValue()
      assert(scored(id)._2 == exp, s"doc $id")
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SimHash64

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 1↔2 exact dups; 3 near-dup of 1 (one word changed); 4/5 unrelated
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "the quick brown fox jumps over the lazy dog near the river"),
    (3L, "the quick brown fox jumps over the lazy cat near the river"),
    (4L, "completely different content about distributed query engines"),
    (5L, "yet another unrelated snippet discussing parquet column stats"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
    val survivors = Dedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds exact and near dups, not unrelated") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)), s"missing exact pair in $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"missing near pair in $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"false positive: $pairs")
  }

  test("minhash est_jaccard ~ exact jaccard") {
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text",
      shingleWords = 2, numHashes = 32)
    assert(sig.count() == 5)
    val cands = Dedup.minhashCandidates(sig, "doc_id", bands = 16, rowsPerBand = 2)
    val verified = Dedup.jaccardVerify(cands, docs, "doc_id", "text", 2, 0.0)
      .filter($"id_a" === 1 && $"id_b" === 2).first()
    assert(verified.getAs[Double]("jaccard") == 1.0)
    assert(verified.getAs[Double]("est_jaccard") == 1.0)
  }

  test("simhash: identical→0 hamming, near→small, unrelated→large") {
    val fp = Dedup.simhashFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(ham(1, 2) == 0)
    assert(ham(1, 3) <= 12, s"near-dup hamming ${ham(1, 3)}")
    assert(ham(1, 4) > 12, s"unrelated hamming ${ham(1, 4)}")
  }

  test("simhash near-dup operator matches the fingerprint analysis") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text",
      bands = 4, maxHamming = 12)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 5L && p._1 == 4L))
  }

  test("token-less documents never pair as near-dups (NaN/sentinel guard)") {
    // CJK-only / punctuation-only / empty texts produce no [a-z0-9]
    // tokens: all-sentinel minhash signatures and all-zero simhash
    // fingerprints would otherwise collide pairwise
    val weird = Seq(
      (10L, "你好世界这是测试"), (11L, "完全不同的中文文本"),
      (12L, "!!! ??? ***"), (13L, ""), (14L, "normal english words here"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashNearDups(weird, "doc_id", "text",
      shingleWords = 2, numHashes = 32, bands = 16, threshold = 0.1)
      .collect()
    assert(mh.isEmpty, s"minhash false positives: ${mh.mkString(";")}")
    val sh = Dedup.simhashNearDups(weird, "doc_id", "text",
      bands = 4, maxHamming = 3).collect()
    assert(sh.isEmpty, s"simhash false positives: ${sh.mkString(";")}")
  }

  test("simhash64 expression edge cases") {
    val out = Seq(Seq.empty[String], Seq("a"))
      .toDF("toks").select(SimHash64.simhash64($"toks").as("h"))
      .as[Long].collect()
    assert(out.length == 2) // empty array → all-negative votes → 0L
    assert(out(0) == 0L)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Skew-adversarial tests for the dedup family: power-law duplicate
  * distributions where one text is duplicated 10^4 times.
  *
  * Without the `maxBucketSize` guard, 10^4 identical documents land in
  * the SAME LSH bucket in every band, and the bucket self-join emits
  * bands * C(10^4, 2) ~ 4*10^8 candidate rows — the quadratic blowup
  * that makes one hot key the whole job's straggler at 100 TB. These
  * tests pin the guard's contract: the hot bucket is dropped (bounded
  * output, bounded runtime), while legitimate duplicate pairs
  * elsewhere in the corpus are still found.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val HotCount = 10000
  private val hotText =
    "the exact same viral boilerplate paragraph repeated everywhere " +
      "across the crawl with identical wording and punctuation"

  // 40 planted duplicate pairs (ids 20000+2k ~ 20000+2k+1), each pair
  // its own distinct content; 300 unique filler docs. Seeded — the
  // corpus is identical on every run.
  private def word(r: scala.util.Random): String = {
    val v = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
      "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    v(r.nextInt(v.size)) + r.nextInt(1000)
  }

  private lazy val corpus: DataFrame = {
    val r = new scala.util.Random(7)
    val hot = (0 until HotCount).map(i => (i.toLong, hotText))
    val pairs = (0 until 40).flatMap { k =>
      val t = (0 until 14).map(_ => word(r)).mkString(" ")
      Seq((20000L + 2 * k, t), (20000L + 2 * k + 1, t))
    }
    val filler = (0 until 300).map { k =>
      (30000L + k, (0 until 14).map(_ => word(r)).mkString(" "))
    }
    (hot ++ pairs ++ filler).toDF("doc_id", "text")
  }

  private def isHot(id: Long): Boolean = id < HotCount
  private val plantedPairs: Set[(Long, Long)] =
    (0 until 40).map(k => (20000L + 2 * k, 20000L + 2 * k + 1)).toSet

  test("exact dedup aggregates the 10^4-dup group without blowup") {
    val groups = Dedup.exact(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(0L) == HotCount.toLong)
    // one group per planted pair (count 2) + one per filler (count 1)
    assert(groups.size == 1 + 40 + 300)
    val survivors = Dedup.exactSurvivors(corpus, "doc_id", "text").count()
    assert(survivors == 1 + 40 + 300)
  }

  test("minhash LSH: hot bucket dropped by the size guard, planted pairs still found") {
    val out = Dedup.minhashNearDups(corpus, "doc_id", "text",
      shingleWords = 3, numHashes = 32, bands = 8, threshold = 0.7)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    // guard engaged: zero pairs from the 10^4-dup group (unguarded this
    // would be ~5*10^7 output pairs and the test would not finish)
    assert(!out.exists(p => isHot(p._1) || isHot(p._2)),
      s"hot-group pair leaked: ${out.filter(p => isHot(p._1)).take(5).toSeq}")
    // recall away from the hot key is unaffected: every planted exact
    // pair (jaccard 1.0) is found
    assert(plantedPairs.subsetOf(out.toSet),
      s"missing planted pairs: ${(plantedPairs -- out.toSet).take(5)}")
    // bounded output: planted pairs plus (verified) noise only
    assert(out.length <= plantedPairs.size + 10, s"output blowup: ${out.length}")
  }

  test("simhash: hot bucket dropped by the size guard, planted pairs still found") {
    val out = Dedup.simhashNearDups(corpus, "doc_id", "text",
      bands = 4, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!out.exists(p => isHot(p._1) || isHot(p._2)))
    assert(plantedPairs.subsetOf(out.toSet),
      s"missing planted pairs: ${(plantedPairs -- out.toSet).take(5)}")
  }

  test("bloom incremental dedup: skewed corpus, exact verdicts, linear in delta") {
    val delta = Seq(
      (100000L, hotText), // dup of the hot group
      (100001L, corpus.filter($"doc_id" === 20000L).select("text")
        .as[String].first()), // dup of a planted pair
      (100002L, "a genuinely novel document that exists nowhere upstream"),
      (100003L, "another brand new never seen piece of training text"))
      .toDF("doc_id", "text")
    val out = Dedup.bloomNewDocs(corpus, delta, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(100000L -> true, 100001L -> true,
      100002L -> false, 100003L -> false))
  }

  test("property: identical-content groups pair iff 2 <= size <= maxBucketSize") {
    // power-law group sizes; any group larger than the bucket cap must
    // contribute zero pairs, any group in [2, cap] must contribute all
    // its C(s,2) pairs (identical text => same bucket in every band,
    // est/exact jaccard 1.0)
    val cap = 50
    val sizesGen: Gen[List[Int]] = Gen.listOfN(6, Gen.frequency(
      (4, Gen.choose(1, 10)),      // long tail
      (2, Gen.choose(11, cap)),    // mid groups, under the cap
      (1, Gen.choose(cap + 1, 400)) // hot groups, over the cap
    ))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(sizesGen, Gen.choose(0L, Long.MaxValue)) { (sizes, seed) =>
        val r = new scala.util.Random(seed)
        val rows = sizes.zipWithIndex.flatMap { case (s, g) =>
          val t = (0 until 14).map(_ => word(r)).mkString(" ")
          (0 until s).map(i => ((g * 10000 + i).toLong, t))
        }
        val pairs = Dedup.minhashNearDups(rows.toDF("doc_id", "text"),
          "doc_id", "text", shingleWords = 3, numHashes = 32, bands = 8,
          threshold = 0.9, maxBucketSize = cap)
          .select("id_a", "id_b").collect()
          .map(x => (x.getLong(0), x.getLong(1)))
        val byGroup = pairs.groupBy(p => p._1 / 10000)
        sizes.zipWithIndex.forall { case (s, g) =>
          val got = byGroup.getOrElse(g.toLong, Array.empty).length
          val want = if (s >= 2 && s <= cap) s * (s - 1) / 2 else 0
          got == want
        } && pairs.forall(p => p._1 / 10000 == p._2 / 10000)
      })
    assert(res.passed, res.status.toString)
  }
}

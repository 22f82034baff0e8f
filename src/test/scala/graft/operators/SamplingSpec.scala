package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 100L)
    .map(i => (i, if (i <= 60) "en" else if (i <= 90) "de" else "fr",
      (i % 10 + 1) * 100))
    .toDF("doc_id", "lang", "n_tokens")

  test("degenerate parameters select nothing instead of throwing") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("lang", "id")
    assert(Sampling.stratified(df, "lang", "id", 0).count() == 0L)
    assert(Sampling.mixture(df, "lang", "id", Map.empty, 10).count() == 0L)
    assert(Sampling.mixture(df, "lang", "id", Map("a" -> 0.0), 10).count() == 0L)
  }

  test("stratified plan has no per-stratum window") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 50).map(i => (s"s${i % 3}", i.toLong)).toDF("lang", "id")
    val plan = Sampling.stratified(df, "lang", "id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"stratified still shuffles everything into |strata| window partitions:\n$plan")
    assert(plan.contains("min_keys"), "expected the bounded-keys aggregate")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      "the per-stratum keep-list must broadcast, not shuffle the data")
  }

  test("golden plan: the corpus never shuffles (d14/d28 MinKeys invariant)") {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // the MinKeys design: the only shuffle in the plan is the tiny
    // keep-list aggregate (|strata| rows of buffers); the corpus
    // itself flows scan → join with no Exchange on the streamed side
    // and its payload columns never ride through any shuffle
    def corpusNeverShuffles(df: org.apache.spark.sql.DataFrame,
                            corpusCol: String): Unit = {
      val plan = df.queryExecution.sparkPlan // pre-AQE, traversable
      val joins = plan.collect { case j: BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, s"expected a broadcast keep-list join:\n$plan")
      joins.foreach { j =>
        val streamed = j.buildSide match {
          case BuildRight => j.left
          case BuildLeft => j.right
        }
        assert(streamed.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"corpus (streamed) side of the join shuffles:\n$plan")
      }
      plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
        assert(!e.output.map(_.name).contains(corpusCol),
          s"a shuffle carries the corpus payload ($corpusCol):\n$plan")
      }
    }
    corpusNeverShuffles(
      Sampling.stratified(docs, "lang", "doc_id", 15), "doc_id")
    corpusNeverShuffles(
      Sampling.temperatureMixture(docs, "lang", "doc_id", total = 50),
      "doc_id")
  }

  test("stratified: exact n per stratum, deterministic, capped by size") {
    val s1 = Sampling.stratified(docs, "lang", "doc_id", 15)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 15L, "de" -> 15L, "fr" -> 10L)) // fr has 10
    val s2 = Sampling.stratified(docs, "lang", "doc_id", 15)
    assert(s1.collect().map(_.toString).sorted.toSeq ==
      s2.collect().map(_.toString).sorted.toSeq)
  }

  test("token budget: per-stratum running totals stay within budget") {
    val out = Sampling.tokenBudget(docs, "lang", "doc_id", "n_tokens", 2000L)
    val sums = out.groupBy("lang").sum("n_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.values.forall(_ <= 2000L), sums)
    assert(out.count() > 0)
    // greedy: adding the next hash-ordered doc would break the budget —
    // so each stratum's total is within one doc of the cap (>= 1100
    // here since max doc size is 1000+100)
    assert(sums.values.forall(_ >= 2000L - 1100L), sums)
  }

  test("sequence packing matches a local concat-and-chunk reference") {
    val seqLen = 1000L
    val out = Sampling.packSequences(docs, "doc_id", "n_tokens",
      seqLen, nShards = 4)
      .select("doc_id", "shard", "seq_first", "seq_last", "seq_offset")
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // reference: per shard, order by md5(id) hex, walk the token stream
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = (1L to 100L).map(i => (i, (i % 10 + 1) * 100))
    rows.groupBy(_._1 % 4).foreach { case (shard, members) =>
      var pos = 0L
      members.sortBy(m => md5hex(m._1.toString)).foreach { case (id, n) =>
        val (f, l, o) = (pos / seqLen,
          if (n <= 0) pos / seqLen else (pos + n - 1) / seqLen,
          pos % seqLen)
        assert(out(id) == ((id, shard.toInt, f, l, o)),
          s"id=$id expected ($f,$l,$o) got ${out(id)}")
        pos += n
      }
    }
    // documents longer than the remaining space straddle boundaries
    assert(out.values.exists(r => r._4 > r._3), "no straddling doc in fixture")
  }

  test("empty documents occupy no tokens but keep a position") {
    val d = Seq((1L, 500L), (2L, 0L), (3L, 700L)).toDF("doc_id", "n")
    val r = Sampling.packSequences(d, "doc_id", "n", seqLen = 600,
      nShards = 1)
      .select("doc_id", "seq_first", "seq_last", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    // md5 order of ("1","2","3") is 1 < 2 < 3 (c4ca.. < c81e.. < eccb..)
    // → stream: doc1 [0,500), doc2 at 500 (empty), doc3 [500,1200)
    assert(r(1L) == ((1L, 0L, 0L, 0L)))
    assert(r(2L) == ((2L, 0L, 0L, 500L)))
    assert(r(3L) == ((3L, 0L, 1L, 500L)))
  }

  test("mixture: weighted quotas with deterministic fill") {
    val out = Sampling.mixture(docs, "lang", "doc_id",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2), total = 20)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 10L, "de" -> 6L, "fr" -> 4L), counts)
  }

  test("temperature mixture: quotas follow sqrt of stratum size") {
    // strata sizes 60/30/10 → sqrt ≈ 7.745967/5.477226/3.162278,
    // wsum ≈ 16.385471 → quotas floor(100·w/wsum) = 47/33/19, then
    // capped by what each stratum actually has (30, 10)
    val out = Sampling.temperatureMixture(docs, "lang", "doc_id", total = 100)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 47L, "de" -> 30L, "fr" -> 10L), counts)
  }

  test("temperature mixture flattens the mix relative to raw shares") {
    val out = Sampling.temperatureMixture(docs, "lang", "doc_id", total = 50)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // raw shares are 60/30/10%; alpha=0.5 must pull the big stratum
    // below its raw share and the small one above
    assert(counts("en").toDouble / 50 < 0.6)
    assert(counts("fr").toDouble / 50 > 0.1)
  }

  test("temperature mixture is deterministic and window-free") {
    val a = Sampling.temperatureMixture(docs, "lang", "doc_id", total = 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(docs.repartition(7), "lang", "doc_id",
      total = 30).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    val plan = Sampling.temperatureMixture(docs, "lang", "doc_id", total = 30)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"per-stratum window leaked:\n$plan")
  }
}

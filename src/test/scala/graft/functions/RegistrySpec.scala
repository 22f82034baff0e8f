package graft.functions

import graft.SparkSpec

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("kernels callable from SQL after registration") {
    Registry.registerAll(spark)
    Seq((1L, "the quick brown fox", Seq(0.6f, 0.8f), Seq(0.6f, 0.8f)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("reg_t")
    val row = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |       size(minhash_signature(text)) AS sig_len,
        |       mink_sketch64(text) AS mk,
        |       lang_id(text) AS lang,
        |       cosine_sim(a, b) AS cos,
        |       srp_bucket(a) AS bucket
        |FROM reg_t""".stripMargin).first()
    assert(row.getInt(row.fieldIndex("sig_len")) == 32)
    assert(math.abs(row.getDouble(row.fieldIndex("cos")) - 1.0) < 1e-12)
    assert(row.getString(row.fieldIndex("lang")) == "en")
  }

  test("heap aggregates callable from SQL") {
    Registry.registerAll(spark)
    Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7), (2L, 13L, 0.5))
      .toDF("q", "n", "c").createOrReplaceTempView("reg_agg")
    val top = spark.sql(
      """SELECT q, top_k_by_score(c, n, 2) AS top FROM reg_agg GROUP BY q
        |ORDER BY q""".stripMargin).collect()
    assert(top(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))
      == Seq(10L, 11L))
    val keys = spark.sql(
      """SELECT min_keys(CAST(n AS STRING), 2) AS ks FROM reg_agg"""
    ).first().getSeq[String](0)
    assert(keys == Seq("10", "11"))
  }

  test("composed column functions callable from SQL") {
    Registry.registerAll(spark)
    Seq((1L, "email me at a@b.co about the quick brown fox"))
      .toDF("id", "text").createOrReplaceTempView("reg_c")
    val row = spark.sql(
      """SELECT redact_pii(text) AS red,
        |       quality_stats(text).n_tokens AS n_toks,
        |       token_count_bpe(text) AS bpe
        |FROM reg_c""".stripMargin).first()
    assert(row.getString(0).contains("<EMAIL>"))
    assert(row.getLong(1) >= 9L)
    assert(row.getInt(2) >= 9)
  }
}

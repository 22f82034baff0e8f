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
}

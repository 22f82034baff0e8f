package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the custom kernels in the session's FunctionRegistry so
  * the SQL passthrough surface (QueryEngine / spark.sql) can call them
  * by name — the reference's users talk SQL, not the Column API:
  *
  *   SELECT simhash64(tokens), minhash_signature(text), mink_sketch64(text),
  *          lang_id(text), cosine_sim(a, b), srp_bucket(v) FROM …
  */
object Registry {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Composite functions register as hand-built catalyst trees (the
    // Column API builds unresolved ColumnNodes that won't re-analyze
    // inside a registered function body).
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace, RegExpExtractAll, Size}
    def replaceChain(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     steps: Seq[(String, String)]) =
      steps.foldLeft(e) { case (acc, (re, tag)) =>
        RegExpReplace(acc, Literal(re), Literal(tag))
      }
    reg.createOrReplaceTempFunction("redact_pii",
      exprs => replaceChain(exprs.head, Seq(
        Redaction.urlRe -> "<URL>", Redaction.emailRe -> "<EMAIL>",
        Redaction.ipv4Re -> "<IP>", Redaction.phoneRe -> "<PHONE>")),
      "scala_udf")
    reg.createOrReplaceTempFunction("quality_stats",
      exprs => QualityStatsExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("token_count_bpe",
      exprs => Size(RegExpExtractAll(exprs.head,
        Literal("'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"),
        Literal(0))), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs.head, 3, 32), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hash_set",
      exprs => ShingleHashSet(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("mink_sketch64",
      exprs => MinKSketch64(exprs.head, 8, 8, 512), "scala_udf")
    reg.createOrReplaceTempFunction("lang_id",
      exprs => LangIdExpr(exprs.head, 0.02), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("srp_bucket",
      exprs => SrpBucket(exprs.head, 8, 64, 42L), "scala_udf")

    // aggregates: k arrives as a foldable literal argument
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case o => throw new IllegalArgumentException(s"k must be an int literal, got $o")
      }
    reg.createOrReplaceTempFunction("top_k_by_score",
      exprs => TopKByScore(exprs(0), exprs(1), litInt(exprs(2)))
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("min_keys",
      exprs => MinKeys(exprs(0), litInt(exprs(1)))
        .toAggregateExpression(), "scala_udf")
  }
}

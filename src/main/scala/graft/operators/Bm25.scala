package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions

/** BM25 ranked retrieval (Robertson & Zaragoza 2009) over a document
  * corpus for a bag-of-terms query — the classic probabilistic IR
  * scoring function, and the exact-integer core (tf, df, dl) that
  * TF-IDF-family relevance reduces to:
  *
  *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Scale shape: the token stream is SEMI-filtered to the query's terms
  * before anything aggregates — tf/df tables are |matching docs| ×
  * |terms|-bounded, never corpus-token-bounded; doc lengths are a
  * map-side projection; N/total-length collapse to one broadcast row;
  * the final ranking is a TakeOrderedAndProject over per-doc scores
  * (top-N, never a global sort materialization).
  *
  * Determinism: tf/df/dl/N are exact integers on any engine; the
  * score uses only correctly-rounded double ops (+,−,×,÷ and ln —
  * verified bit-identical across JVM and DuckDB libm in this
  * environment), per-term scores snap to a 9-dp grid, and the per-doc
  * sum runs in exact DECIMAL so partition order cannot perturb ranks.
  */
object Bm25 {

  /** Top-N documents for `terms`: (idCol, matched_terms, score). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
             topN: Int = 20): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val t = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
    val dl = t.select(col(idCol), size(col("__toks")).cast("long").as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__tt"))
    val tf = t.select(col(idCol), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__term").agg(count(lit(1)).as("__df"))

    val avgdl = col("__tt").cast("double") / col("__n")
    // libmLn, not functions.log: StrictMath vs libm last-ulp parity
    // (see functions.MathKernels)
    val idf = graft.functions.MathKernels.libmLn(lit(1.0) +
      ((col("__n") - col("__df")).cast("double") + 0.5)
        / (col("__df").cast("double") + 0.5))
    val tnorm = (col("__tf").cast("double") * lit(k1 + 1.0)) /
      (col("__tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + (lit(b) * col("__dl").cast("double")) / avgdl))

    val perTerm = tf
      .join(broadcast(dfT), Seq("__term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(idf * tnorm, 9).cast(DecimalType(18, 9)).as("__ts"))

    // the decimal sum is exact on the 9-dp grid — emit its double
    // verbatim (identical bits on any engine); a cosmetic round(×,4)
    // would land grid sums exactly on half-way points where engines'
    // rounding modes disagree
    perTerm.groupBy(col(idCol))
      .agg(count(lit(1)).as("matched_terms"), sum(col("__ts")).as("__s"))
      .orderBy(col("__s").desc, col(idCol))
      .limit(topN)
      .select(col(idCol), col("matched_terms"),
        col("__s").cast("double").as("score"))
  }
}

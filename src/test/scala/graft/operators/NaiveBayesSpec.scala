package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // two classes with disjoint vocabularies + one ambiguous shared word
  private lazy val docs = Seq(
    (0L, "spark shuffle partition broadcast catalyst tungsten", "eng"),
    (1L, "partition catalyst shuffle spark exchange plan", "eng"),
    (2L, "broadcast tungsten codegen spark catalyst shuffle", "eng"),
    (3L, "sonett reim strophe vers metrum dichter", "poe"),
    (4L, "vers dichter reim sonett klang silbe", "poe"),
    (5L, "strophe silbe metrum dichter vers reim", "poe"),
    // held out (id % 10 >= 8 under mod-10/8 split → use explicit pred)
    (8L, "catalyst shuffle spark partition", "eng"),
    (9L, "dichter reim vers strophe", "poe"))
    .toDF("doc_id", "text", "lang")

  private def out = NaiveBayes.classify(docs, "doc_id", "text", "lang",
    trainPred = col("doc_id") < 8)

  test("held-out documents with separable vocabulary classify correctly") {
    val preds = out.select("doc_id", "predicted", "correct", "is_train")
      .as[(Long, String, Boolean, Boolean)].collect().sortBy(_._1)
    assert(preds.filter(!_._4).forall(_._3),
      s"held-out rows must all be correct: ${preds.mkString(", ")}")
    assert(preds.count(!_._4) == 2)
  }

  test("training rows reproduce their own labels") {
    val train = out.filter($"is_train").select("correct").as[Boolean].collect()
    assert(train.forall(identity))
  }

  test("token-less documents fall back to the prior argmax") {
    val withEmpty = docs.union(Seq((20L, "", "eng")).toDF("doc_id", "text", "lang"))
    val r = NaiveBayes.classify(withEmpty, "doc_id", "text", "lang",
      trainPred = col("doc_id") < 8)
      .filter($"doc_id" === 20L)
      .select("n_toks", "predicted").as[(Long, String)].head()
    // priors are equal (3 vs 3) → tie breaks to the first label
    assert(r == ((0L, "eng")), s"got $r")
  }

  test("inference is one tokenizing pass: heap aggregate, no re-scan") {
    val plan = out.queryExecution.executedPlan.toString
    // the corpus here is a local relation, so its scans render as
    // LocalTableScan (a parquet corpus would render FileScan — count
    // the specific node, not the generic "Scan " substring, which
    // also matches unrelated nodes and plan-rendering changes). The
    // invariant: at most two corpus reads — the scoring pass plus the
    // (broadcast) actual/is_train join; the regression guarded
    // against is the THIRD scan the old relational spelling paid
    // because per-class sums and token totals couldn't share an
    // exchange.
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans >= 1 && scans <= 2, s"corpus scans = $scans\n$plan")
    assert("FileScan".r.findAllIn(plan).isEmpty, plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("predict with an externally trained model matches classify") {
    val (w, cs) = NaiveBayes.train(docs.filter($"doc_id" < 8),
      "doc_id", "text", "lang")
    val viaPredict = NaiveBayes.predict(docs, w, cs, "doc_id", "text")
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    val viaClassify = out.select("doc_id", "predicted")
      .as[(Long, String)].collect().toMap
    assert(viaPredict == viaClassify)
  }
}

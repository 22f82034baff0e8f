package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: why does Curation.report's Observation harvest see an
  * empty metrics row once jaccardVerify eagerly checkpoints its
  * candidate list? Prints every QueryExecution's (name, observedMetrics
  * keys, logical-contains-CollectMetrics) so the completing execution
  * is identifiable.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val hasCm = qe.logical.collect {
          case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.name
        }
        println(s"[obsprobe] action=$funcName logicalCM=${hasCm.size} " +
          s"observed=${qe.observedMetrics.keys.size}")
        if (hasCm.nonEmpty && qe.observedMetrics.isEmpty) {
          println("[obsprobe] executedPlan for metricless execution:")
          println(qe.executedPlan.treeString.linesIterator
            .map(l => "[obsplan] " + l).mkString("\n"))
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })

    val r = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def text(): String =
      (0 until 12).map(_ => words(r.nextInt(words.size)) + r.nextInt(50))
        .mkString(" ")
    val base = (0 until 600).map(i => (i.toLong, text()))
    val exactDups = (0 until 100).map(i => (1000L + i, base(i)._2))
    val lowQ = (0 until 50).map(i => (2000L + i, "x"))
    val docs = (base ++ exactDups ++ lowQ).toDF("doc_id", "text")

    val rep = graft.operators.Curation.report(docs, "doc_id", "text")
    println(s"[obsprobe] report=$rep")
    spark.stop()
  }
}

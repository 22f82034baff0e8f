package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Structural fingerprint of a FINAL executed plan (round 17, r16
  * verdict task 1): the per-draw identity that lets a bench artifact
  * certify its own outliers. Two executions of the same entry whose
  * fingerprints match differ only by host condition (the d12 sf1 151 s
  * driver draw); a mismatch is a plan flip (the r14 e08 / r15 d12 AQE
  * broadcast conversions) to DrawProbe, never to wave off as noise.
  *
  * The fingerprint is STRUCTURAL, not textual: a DFS over the executed
  * tree (descending into adaptive sub-plans, query stages, and
  * subqueries) emitting per node the class name plus exactly the
  * discriminators whose flips the fence rounds have seen matter —
  * join strategy, join type, build side, sorted join-key names,
  * exchange partitioning, and scan output columns. Textual plan
  * hashing was tried first and rejected: RewriteDistinctAggregates
  * assigns distinct-group `gid`s from an expr-id-keyed map, so
  * count-distinct plans (q34 and friends) permute their Expand
  * projections per RUN while being exactly the same plan — a 17-entry
  * false-flip list at sf0.01. Node order stays significant (a
  * build-side swap reorders join children — the r16 d08 find); what
  * varies per run (expr ids, gid numbering, stage ordinals, AQE
  * partition counts) is simply never emitted.
  */
object PlanFingerprint {

  private def keyNames(keys: Seq[Expression]): String =
    keys.flatMap(_.collect { case a: AttributeReference => a.name })
      .sorted.mkString(",")

  /** One line per node, DFS pre-order. */
  def describe(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      // schema v2 (round 18, r17 ADVICE): BOTH sides' key names — with
      // only left-side keys, a change confined to the right-side join
      // keys (or an equal-named child swap) hashed identically. One-time
      // hash reset vs r17 artifacts; cross-round "plans" comparison
      // restarts at this round's values.
      val extra = p match {
        case j: SortMergeJoinExec =>
          s"|${j.joinType}|keys=${keyNames(j.leftKeys)}~${keyNames(j.rightKeys)}"
        case j: ShuffledHashJoinExec =>
          s"|${j.joinType}|${j.buildSide}|keys=${keyNames(j.leftKeys)}~${keyNames(j.rightKeys)}"
        case j: BroadcastHashJoinExec =>
          s"|${j.joinType}|${j.buildSide}|keys=${keyNames(j.leftKeys)}~${keyNames(j.rightKeys)}"
        case j: BroadcastNestedLoopJoinExec =>
          s"|${j.joinType}|${j.buildSide}"
        case e: ShuffleExchangeExec => e.outputPartitioning match {
          case h: HashPartitioning => s"|hash=${keyNames(h.expressions)}"
          case other => s"|${other.getClass.getSimpleName}"
        }
        case e: BroadcastExchangeExec =>
          s"|${e.mode.getClass.getSimpleName}"
        case s: FileSourceScanExec =>
          s"|cols=${s.output.map(_.name).sorted.mkString(",")}"
        case _ => ""
      }
      sb.append("  " * depth).append(p.getClass.getSimpleName)
        .append(extra).append('\n')
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      children.foreach(walk(_, depth + 1))
      // scalar/IN subqueries execute as their own (adaptive) plans and
      // are exactly where a broadcast-shaped regression could hide
      p.subqueries.foreach(walk(_, depth + 1))
    }
    walk(plan, 0)
    sb.result()
  }

  /** 8-hex-char SHA-256 prefix of the structural description. */
  def of(plan: SparkPlan): String = ofString(describe(plan))

  def ofString(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.types.ArrayType

import graft.SparkSpec

/** Plan-assertion pins for the round-15 squeezability rule (r15 verdict
  * task 1): a DATA-DEPENDENT join side carrying fixed-width arrays —
  * minhash signatures, shingle-hash sets, embeddings — or maximally
  * repetitive banded scalars must be FENCED from AQE's runtime
  * broadcast conversion with an explicit shuffle-strategy hint, because
  * those columns compress so well that the COMPRESSED stage size the
  * conversion thresholds sits ~10× below the in-memory hash relation:
  * at the sf1 gate that was a 25–42 s GC-storm draw (measured,
  * DrawProbe r15), at 100 TB it is an executor/driver OOM.
  *
  * The fences live as hints in the operators (`Dedup.minhashCandidates`
  * / `jaccardVerify` / `simhashNearDups`, `Similarity.embeddingNearDups`,
  * `SemDedup.verdicts`) — and until this suite, NOTHING failed the
  * build if a refactor dropped one: AQE would simply start converting
  * again, nondeterministically, at scale only. Here each fenced entry
  * runs at sf0.01 under the default AQE-on session — a scale where
  * every side sits far BELOW the broadcast thresholds, so an unpinned
  * plan reliably picks a broadcast join at planning time and any
  * deleted hint turns a test red immediately (proven once by deleting
  * the d09 hint locally: the {band,bh} self-join came back
  * BroadcastHashJoin — see OPERATORS.md round 16).
  *
  * Two invariants per entry, read off the FINAL adaptive executed plan
  * (QueryStageExec subtrees included):
  *
  *  1. every join keyed on the operator's fence keys whose BOTH sides
  *     output more than the keys (i.e. the corpus-derived pair sides,
  *     not the keys-only bucket/cell filter relations — those are
  *     honestly sized and correctly left to the planner) executes as
  *     the pinned shuffle strategy;
  *  2. no BroadcastHashJoin anywhere in the plan builds a side whose
  *     output carries an ArrayType column — the squeezable class is
  *     never a hash-relation build. (BroadcastNestedLoop stays exempt:
  *     the centroid/query relations ANN legitimately broadcasts are
  *     k×dim / |queries|-bounded by construction, and they ride
  *     crossJoin(broadcast(...)), not a keyed build.)
  */
class BroadcastFenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Execute the entry and return every node of the final adaptive
    * plan, descending into materialized query stages.
    */
  private def finalNodes(name: String): Seq[SparkPlan] = {
    val df: DataFrame = graft.queries.Catalog.all.find(_.name == name)
      .getOrElse(sys.error(s"no catalog entry $name")).run(spark, sf)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: QueryStageExec => p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  private def keyNames(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Set[String] =
    keys.collect { case a: AttributeReference => a.name }.toSet

  /** (node, key set, both-sides-wider-than-keys) for every equi-join. */
  private def joins(nodes: Seq[SparkPlan]): Seq[(SparkPlan, Set[String], Boolean)] =
    nodes.collect {
      case j: SortMergeJoinExec =>
        (j: SparkPlan, keyNames(j.leftKeys),
          j.left.output.size > j.leftKeys.size &&
            j.right.output.size > j.rightKeys.size)
      case j: ShuffledHashJoinExec =>
        (j: SparkPlan, keyNames(j.leftKeys),
          j.left.output.size > j.leftKeys.size &&
            j.right.output.size > j.rightKeys.size)
      case j: BroadcastHashJoinExec =>
        (j: SparkPlan, keyNames(j.leftKeys),
          j.left.output.size > j.leftKeys.size &&
            j.right.output.size > j.rightKeys.size)
    }

  /** Invariant 1: every both-sides-wide join on `fenceKeys` is of the
    * expected physical class, and at least one exists (non-vacuity —
    * an AQE empty-relation elimination that swallowed the join would
    * otherwise pass silently).
    */
  private def assertFenced(nodes: Seq[SparkPlan], fenceKeys: Set[String],
                           expected: Class[_]): Unit = {
    val fenced = joins(nodes).filter { case (_, k, wide) => k == fenceKeys && wide }
    assert(fenced.nonEmpty,
      s"no both-sides-wide join on $fenceKeys in the final plan — " +
        "the fenced join vanished (empty-relation elimination?); spec is vacuous")
    fenced.foreach { case (j, _, _) =>
      assert(expected.isInstance(j),
        s"join on $fenceKeys executed as ${j.getClass.getSimpleName}, " +
          s"expected ${expected.getSimpleName} — a squeezability fence hint " +
          "was dropped (see Dedup/Similarity/SemDedup round-15/16 pins)")
    }
  }

  /** Invariant 2 (tightened round 16 after the suite run caught AQE
    * building the d08 bucket-filter join's hash relation from the
    * CORPUS side): every broadcast hash build must be a keys-only
    * filter relation — no array columns, and no output beyond the join
    * keys. The first full-suite run of this spec proved the need: the
    * fence-key assertions alone passed while the sized-join broadcast
    * the full __sig-carrying banded corpus (the build SIDE, not the
    * join strategy, had flipped). Shuffled-hash builds get the matching
    * side rule: when exactly one side is keys-only, the build must be
    * that side.
    */
  private def assertBuildSidesSafe(nodes: Seq[SparkPlan]): Unit = {
    def buildOf(j: SparkPlan): (SparkPlan, Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        SparkPlan, Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = j match {
      case b: BroadcastHashJoinExec => b.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
          (b.left, b.leftKeys, b.right, b.rightKeys)
        case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
          (b.right, b.rightKeys, b.left, b.leftKeys)
      }
      case s: ShuffledHashJoinExec => s.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
          (s.left, s.leftKeys, s.right, s.rightKeys)
        case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
          (s.right, s.rightKeys, s.left, s.leftKeys)
      }
      case _ => sys.error("not a hash join")
    }
    def keysOnly(side: SparkPlan,
        keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Boolean =
      side.output.map(_.name).toSet.subsetOf(keyNames(keys))
    nodes.foreach {
      case j: BroadcastHashJoinExec =>
        val (build, bKeys, _, _) = buildOf(j)
        val arrays = build.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(arrays.isEmpty,
          s"BroadcastHashJoin builds an array-carrying side ${
            arrays.map(_.name).mkString(",")} — the squeezable class " +
            "must never be a broadcast hash relation")
        assert(keysOnly(build, bKeys),
          s"BroadcastHashJoin build side outputs ${build.output.map(_.name)
            .mkString(",")} beyond its keys ${keyNames(bKeys)} — only " +
            "keys-only filter relations may be hash-broadcast in the " +
            "fenced operators (a wide build here is the corpus at scale)")
      case j: ShuffledHashJoinExec =>
        val (build, bKeys, stream, sKeys) = buildOf(j)
        if (!keysOnly(build, bKeys) && keysOnly(stream, sKeys))
          fail(s"ShuffledHashJoin builds the wide side ${build.output
            .map(_.name).mkString(",")} while the keys-only side ${stream
            .output.map(_.name).mkString(",")} streams — the non-spilling " +
            "build must be the filter relation, never the corpus")
      case _ => ()
    }
  }

  private val smj = classOf[SortMergeJoinExec]
  private val shj = classOf[ShuffledHashJoinExec]

  test("d08: band-bucket self-join stays sort-merge; verify joins stay shuffled") {
    val nodes = finalNodes("d08_minhash_neardups")
    assertFenced(nodes, Set("band", "bh"), smj)   // banded-corpus self-join
    assertFenced(nodes, Set("id_a"), shj)         // verify join 1: build on bare candidates
    assertFenced(nodes, Set("id_b"), smj)         // verify join 2: array×array, spills both sides
    assertBuildSidesSafe(nodes)
  }

  test("d09: simhash band self-join stays sort-merge") {
    val nodes = finalNodes("d09_simhash_neardups")
    assertFenced(nodes, Set("band", "bh"), smj)
    assertBuildSidesSafe(nodes)
  }

  test("e04: SRP-bucket embedding self-join stays sort-merge") {
    val nodes = finalNodes("e04_embedding_neardups")
    assertFenced(nodes, Set("bucket"), smj)
    assertBuildSidesSafe(nodes)
  }

  test("e08: SemDedup cell pair join stays sort-merge") {
    val nodes = finalNodes("e08_semantic_dedup")
    assertFenced(nodes, Set("cell_id"), smj)
    assertBuildSidesSafe(nodes)
  }

  test("d12: the composed curation pipeline inherits every dedup fence") {
    // the catalog entry localCheckpoints (lineage truncated — the
    // dedup joins execute inside the checkpoint, invisible to a final-
    // plan walk), so the pipeline is asserted on the uncached curate()
    // frame directly: same composed plan, full lineage
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val cur = graft.operators.Curation.curate(
      docs, "doc_id", "text", minQuality = 0.3, nearDupThreshold = 0.5)
    cur.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: QueryStageExec => p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(cur.queryExecution.executedPlan)
    assertFenced(nodes, Set("band", "bh"), smj)
    assertBuildSidesSafe(nodes)
  }
}

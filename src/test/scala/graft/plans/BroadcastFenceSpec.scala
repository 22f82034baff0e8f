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

  /** Like [[finalNodes]], but ALSO captures every INTERIOR execution
    * (eager localCheckpoints run their own QueryExecutions — round 18:
    * jaccardVerify materializes its candidate list, so the LSH mining
    * joins now execute inside a checkpoint where a final-plan walk is
    * blind, exactly like the ConnectedComponents rounds). Registers
    * the listener BEFORE construction: the checkpoint fires during
    * catalog-entry construction, not at collect time.
    */
  private def allNodes(name: String): Seq[SparkPlan] = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { seen.add(qe.executedPlan); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val fin = finalNodes(name)
      var stable = 0; var last = -1; var waited = 0
      while (stable < 2 && waited < 5000) {
        val n = seen.size
        if (n == last) stable += 1 else stable = 0
        last = n; Thread.sleep(50); waited += 50
      }
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case q: QueryStageExec => p +: walk(q.plan)
        case _ => p +: p.children.flatMap(walk)
      }
      seen.toArray(Array.empty[SparkPlan]).toSeq.flatMap(walk) ++ fin
    } finally spark.listenerManager.unregister(listener)
  }

  private def keyNames(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Set[String] =
    // deep collect (round 18): null-safe equi-joins (<=>) decompose
    // into coalesce(key, default)/isnull(key) key expressions — a
    // top-level match saw no AttributeReference at all and the d14
    // quota-join fence could never match its key set
    keys.flatMap(_.collect { case a: AttributeReference => a.name }).toSet

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
        // r16 ADVICE: an SHJ build carrying ArrayType columns is the
        // exact non-spilling OOM mode the jaccardVerify join-2 comment
        // describes — forbidden REGARDLESS of what the stream side
        // looks like (the original rule only fired when a keys-only
        // alternative existed)
        val arrays = build.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(arrays.isEmpty,
          s"ShuffledHashJoin builds an array-carrying side ${
            arrays.map(_.name).mkString(",")} — an SHJ build cannot " +
            "spill; array-carrying sides must be sort-merge joined")
        if (!keysOnly(build, bKeys) && keysOnly(stream, sKeys))
          fail(s"ShuffledHashJoin builds the wide side ${build.output
            .map(_.name).mkString(",")} while the keys-only side ${stream
            .output.map(_.name).mkString(",")} streams — the non-spilling " +
            "build must be the filter relation, never the corpus")
      case _ => ()
    }
  }

  /** Opposite-direction fence (round 17, r16 verdict task 3): a
    * construction-bounded side that is SUPPOSED to broadcast must STAY
    * broadcast. A refactor that drops `broadcast(...)` from the
    * decontamination benchmark side, the IVF/PQ centroid and ADC-LUT
    * relations, the Bloom bitmap, or the DSIR/NgramLm weight tables
    * would silently degrade to a corpus-wide shuffle — a perf cliff,
    * not a wrong answer, so nothing else in the suite can see it.
    * Asserts a BroadcastHashJoin keyed exactly `keys` exists in the
    * final adaptive plan.
    */
  private def withNoAutoBroadcast[A](f: => A): A = {
    // presence tests run with size-based broadcasting OFF: at sf0.01
    // every relation sits under the threshold, so the planner would
    // re-broadcast a hint-less join by size and the assertion could
    // never go red (observed: the first red-proof attempt stayed
    // green). With both thresholds at -1 the ONLY broadcasts left are
    // the explicit hints — which is also the honest 100 TB semantics,
    // where nothing is below threshold and only the hints matter.
    val k1 = "spark.sql.autoBroadcastJoinThreshold"
    val k2 = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val o1 = spark.conf.getOption(k1)
    val o2 = spark.conf.getOption(k2)
    spark.conf.set(k1, "-1")
    spark.conf.set(k2, "-1")
    try f
    finally {
      o1.fold(spark.conf.unset(k1))(spark.conf.set(k1, _))
      o2.fold(spark.conf.unset(k2))(spark.conf.set(k2, _))
    }
  }
  private def assertBroadcastJoin(nodes: Seq[SparkPlan],
                                  keys: Set[String]): Unit = {
    val hits = nodes.collect {
      case j: BroadcastHashJoinExec if keyNames(j.leftKeys) == keys => j
    }
    assert(hits.nonEmpty,
      s"no BroadcastHashJoin on $keys in the final plan — a bounded " +
        "side's broadcast hint was dropped (the corpus now shuffles " +
        "for a relation that is small by construction); joins present: " +
        nodes.collect { case j: BroadcastHashJoinExec =>
          s"BHJ(leftKeys=${j.leftKeys})" }.mkString(", "))
  }

  /** The ANN operators' centroid/query relations ride
    * `crossJoin(broadcast(...))` — k×dim / |queries|-bounded by
    * construction; their physical shape is BroadcastNestedLoopJoin.
    */
  private def assertBnlj(nodes: Seq[SparkPlan]): Unit =
    assert(nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "no BroadcastNestedLoopJoin in the final plan — a bounded " +
        "crossJoin(broadcast(...)) relation (centroids/queries/bloom) " +
        "lost its broadcast")

  private val smj = classOf[SortMergeJoinExec]
  private val shj = classOf[ShuffledHashJoinExec]

  test("d08: band-bucket self-join stays sort-merge; verify joins stay shuffled") {
    // allNodes (round 18): the sets frame is a lazy localCheckpoint
    // whose kernel subtree is invisible to a final-plan walk, but every
    // JOIN fence here still executes in plans the walk can see — the
    // interior capture keeps this true if a future change moves a join
    // inside an eager checkpoint
    val nodes = allNodes("d08_minhash_neardups")
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

  test("d13: the tf⋈df term join stays sort-merge (both sides unbounded)") {
    // round 17: the bench plan fingerprint caught AQE runtime-
    // converting this join with a nondeterministic build side — the
    // survivors side is 5 rows per document, the DF side is the corpus
    // vocabulary; neither is a legal broadcast at 100 TB
    val nodes = finalNodes("d13_term_stats")
    assertFenced(nodes, Set("term"), smj)
    assertBuildSidesSafe(nodes)
  }

  test("d18: the cluster-size join stays sort-merge (both sides unbounded)") {
    // round 17: the bench fingerprint caught AQE converting clusters()'
    // labels⋈sizes join with a nondeterministic build side (5/40 sf1
    // draws) — labels is one row per clustered doc, sizes one per
    // component; both data-dependent, both the squeezable scalar shape
    val nodes = finalNodes("d18_neardup_clusters")
    assertFenced(nodes, Set("component"), smj)
    assertBuildSidesSafe(nodes)
  }

  test("d17/d32: decontamination's benchmark-bounded sides stay broadcast") {
    withNoAutoBroadcast {
      val d17 = finalNodes("d17_decontamination")
      assertBroadcastJoin(d17, Set("band", "bh")) // bench buckets / keep
      assertBroadcastJoin(d17, Set("doc_id"))     // candidate pair list
      assertBroadcastJoin(d17, Set("bench_id"))   // benchmark shingle sets
      val d32 = finalNodes("d32_ngram_contamination")
      assertBroadcastJoin(d32, Set("__h"))        // eval 8-gram hash set
    }
  }

  test("e05/e06/e07: IVF and PQ bounded relations stay broadcast") {
    withNoAutoBroadcast {
      val e05 = finalNodes("e05_knn_ivf")
      assertBnlj(e05)                             // k×dim centroid array
      assertBroadcastJoin(e05, Set("cell_id"))    // probe list
      val e06 = finalNodes("e06_knn_ivf_index")
      assertBnlj(e06)
      assertBroadcastJoin(e06, Set("cell_id"))
      // e07's codebook trains via its own driver-bounded jobs (a local
      // PqCodebook), so the serving frame's only broadcast is the
      // per-query ADC LUT crossJoin
      val e07 = finalNodes("e07_knn_pq")
      assertBnlj(e07)                             // per-query ADC LUTs
    }
  }

  test("d22/d25/d30: bloom bitmap and LM weight tables stay broadcast") {
    withNoAutoBroadcast {
      val d22 = finalNodes("d22_bloom_incremental_dedup")
      assertBnlj(d22)                             // the Bloom bitmap row
      assertBroadcastJoin(d22, Set("__key"))      // candidate/match keys
      val d25 = finalNodes("d25_dsir_importance")
      assertBroadcastJoin(d25, Set("bucket"))     // DSIR weight table
      val d30 = finalNodes("d30_bigram_crossentropy")
      assertBroadcastJoin(d30, Set("bb"))         // bigram count table
      assertBroadcastJoin(d30, Set("ub"))         // unigram count table
    }
  }

  test("d26/d24/d14/d28/d29: bounded stats, threshold, and quota " +
    "tables stay broadcast") {
    // round 18 (r17 verdict task 4): the remaining construction- or
    // cardinality-bounded broadcast families. BM25's df table is
    // |query terms|-bounded (the tokens semi-filter precedes it); the
    // quantile-gate and sampling quota tables are one row per group
    // (languages/sources — low-cardinality dimensions, not corpus-
    // proportional); DSIR's weight table is numBuckets-fixed. Losing
    // any of these hints shuffles the corpus for a relation that is
    // small by construction.
    withNoAutoBroadcast {
      val d26 = finalNodes("d26_bm25_search")
      assertBroadcastJoin(d26, Set("__term"))     // per-term df table
      assertBnlj(d26)                             // corpus-stats scalar row
      val d24 = finalNodes("d24_quality_quantile_gate")
      assertBroadcastJoin(d24, Set("lang"))       // per-group thresholds
      val d14 = finalNodes("d14_stratified_sample")
      assertBroadcastJoin(d14, Set("lang"))       // per-stratum keep list
      val d28 = finalNodes("d28_temperature_mix")
      assertBroadcastJoin(d28, Set("source"))     // per-source quotas
      assertBnlj(d28)                             // weight-sum scalar row
      val d29 = finalNodes("d29_dsir_resample")
      assertBroadcastJoin(d29, Set("bucket"))     // DSIR weight table
    }
  }

  test("e01/e02/e10: broadcast query sets stay broadcast") {
    // the ANN query relations are |queries|-bounded by construction;
    // e01/e10 ride crossJoin(broadcast(q)) (BNLJ), e02's multiprobe
    // explosion joins on the SRP bucket (BHJ — the build side carries
    // the query vectors, which is fine: bounded side, not the corpus)
    withNoAutoBroadcast {
      assertBnlj(finalNodes("e01_knn_brute"))
      assertBroadcastJoin(finalNodes("e02_knn_srp"), Set("bucket"))
      assertBnlj(finalNodes("e10_knn_int8"))
    }
  }

  test("e08: the pairable-cell filter and dropped-id relations stay broadcast") {
    // SemDedup's two bounded sides in the default branch: the
    // keys-only pairable cell list (≤ nCells rows) and the dropped-id
    // verdict join (dropped ∝ duplicates found, bounded by the pair
    // stage's own output — and keys-only); the >4M-cell degraded
    // branch has its own SHUFFLE_HASH pin test below
    withNoAutoBroadcast {
      val e08 = finalNodes("e08_semantic_dedup")
      assertBroadcastJoin(e08, Set("cell_id"))
      assertBroadcastJoin(e08, Set("vec_id"))
    }
  }

  test("SemDedup degraded branch: past the broadcast bound the cell " +
    "filter pins SHUFFLE_HASH off the corpus and verdicts are identical") {
    // r16 verdict task 5: the >BroadcastableCells branch exists FOR the
    // trillion-document regime and no test executed its plan. The test
    // seam (broadcastableCells param) forces it at sf0.01 scale.
    // threshold 0.0: the synthetic embeddings are near-orthogonal, so
    // a high threshold drops NOBODY — and an empty `dropped` lets
    // AQE's empty-relation elimination erase the whole pair pipeline
    // from the executed plan (observed: the first version of this test
    // asserted against a plan containing no joins at all)
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
    def run(bound: Int) = graft.operators.SemDedup.verdicts(
      emb, "vec_id", "embedding", threshold = 0.0, nCells = 8,
      broadcastableCells = bound)
    val degraded = run(4) // k=8 > 4 → shuffle_hash branch
    degraded.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case q: QueryStageExec => p +: walk(q.plan)
      case _ => p +: p.children.flatMap(walk)
    }
    val nodes = walk(degraded.queryExecution.executedPlan)
    // the cells⋈pairable filter join: SHJ with the build side the
    // keys-only cell list — never the corpus (id + embedding)
    val filterJoins = nodes.collect {
      case j: ShuffledHashJoinExec if keyNames(j.leftKeys) == Set("cell_id") &&
        (j.left.output.size == j.leftKeys.size ||
          j.right.output.size == j.rightKeys.size) => j
    }
    assert(filterJoins.nonEmpty,
      "degraded branch executed no ShuffledHashJoin on cell_id with a " +
        "keys-only side — the SHUFFLE_HASH pin is gone")
    // the pair join inherits the e08 merge pin in this branch too
    assertFenced(nodes, Set("cell_id"), smj)
    assertBuildSidesSafe(nodes)
    // behavior parity: branch choice is a physical-plan concern only
    val a = run(Int.MaxValue).orderBy("vec_id").collect().toSeq
    val b = degraded.orderBy("vec_id").collect().toSeq
    assert(a == b, "degraded branch changed SemDedup verdicts")
  }

  test("CC iteration: the propagation join stays sort-merge and no " +
    "broadcast join executes inside checkpoint lineage") {
    // round 18 (r17 verdict task 1): the min-label iteration joins run
    // inside per-round localCheckpoint actions — a final-plan walk
    // never sees them, so this fence captures EVERY interior execution
    // via a QueryExecutionListener (the Bench SPARK_GRAFT_INTERIOR_FP
    // mechanism, inlined). The sf1 probe (10 DrawProbe draws + 11
    // Bench interior draws, OPERATORS.md round 18) showed AQE
    // runtime-converting both the propagation join e(a)⋈labels(id)
    // and the old convergence join to broadcast builds — labels is
    // node-scale, data-dependent, the squeezable two-long shape, not
    // a legal broadcast at corpus scale. The convergence join was
    // REMOVED (monotone label-sum check); the propagation join is
    // merge-pinned. Red-proven: deleting the shuffle_merge hint turns
    // the all-interior-joins-SMJ assert red at this tiny scale (AQE
    // broadcasts both sides unpinned).
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { seen.add(qe.executedPlan); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // a path graph (diameter 9) forces several propagation rounds —
      // a clique would converge at the seed and never execute the join
      import spark.implicits._
      val edges = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val labels = graft.operators.ConnectedComponents
        .components(edges, "id_a", "id_b")
      // correctness anchor: one component labeled by the min id
      assert(labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        (0L to 9L).map(i => (i, 0L)).toSet)
      // drain the async listener bus: wait until the captured-plan
      // stream goes stable (two consecutive quiet polls)
      var stable = 0; var last = -1; var waited = 0
      while (stable < 2 && waited < 5000) {
        val n = seen.size
        if (n == last) stable += 1 else stable = 0
        last = n; Thread.sleep(50); waited += 50
      }
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case q: QueryStageExec => p +: walk(q.plan)
        case _ => p +: p.children.flatMap(walk)
      }
      val nodes = seen.toArray(Array.empty[SparkPlan]).toSeq.flatMap(walk)
      // joins() keys off the LEFT side: e(a)⋈labels(id) → {a}
      val prop = joins(nodes).filter { case (_, k, _) => k == Set("a") }
      assert(prop.nonEmpty,
        "no propagation join e(a)⋈labels(id) captured from the interior " +
          "executions — the listener drain missed the checkpoint rounds; " +
          "spec is vacuous")
      prop.foreach { case (j, _, _) =>
        assert(j.isInstanceOf[SortMergeJoinExec],
          s"CC propagation join executed as ${j.getClass.getSimpleName} — " +
            "the shuffle_merge pin on the labels side was dropped")
      }
      // nothing inside components() may broadcast: every side is
      // node- or edge-scale and data-dependent (the old convergence
      // join would trip this assert were it still present)
      val bhj = nodes.filter(n => n.isInstanceOf[BroadcastHashJoinExec] ||
        n.isInstanceOf[BroadcastNestedLoopJoinExec])
      assert(bhj.isEmpty,
        s"broadcast join(s) executed inside ConnectedComponents lineage: " +
          bhj.map(_.getClass.getSimpleName).mkString(", "))
    } finally spark.listenerManager.unregister(listener)
  }

  test("d12: the composed curation pipeline inherits every dedup fence") {
    // the pipeline is asserted on the uncached curate() frame (the
    // catalog entry's own localCheckpoint would hide even the verify
    // joins); round 18: the banded self-join now executes inside
    // jaccardVerify's candidate checkpoint, so interior executions are
    // captured too — listener registered BEFORE construction, because
    // the checkpoint fires inside curate()
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { seen.add(qe.executedPlan); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = graft.core.Tables.load(spark, sf, "documents")
      val cur = graft.operators.Curation.curate(
        docs, "doc_id", "text", minQuality = 0.3, nearDupThreshold = 0.5)
      cur.collect()
      var stable = 0; var last = -1; var waited = 0
      while (stable < 2 && waited < 5000) {
        val n = seen.size
        if (n == last) stable += 1 else stable = 0
        last = n; Thread.sleep(50); waited += 50
      }
      def walk(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
        case q: QueryStageExec => p +: walk(q.plan)
        case _ => p +: p.children.flatMap(walk)
      }
      val nodes = seen.toArray(Array.empty[SparkPlan]).toSeq.flatMap(walk) ++
        walk(cur.queryExecution.executedPlan)
      assertFenced(nodes, Set("band", "bh"), smj)
      assertBuildSidesSafe(nodes)
    } finally spark.listenerManager.unregister(listener)
  }
}

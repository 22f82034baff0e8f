package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.snapshot.SnapshotStore

/** Seeded sync-lifecycle fuzzer (round-10 verdict item 4): the directed
  * churn/drift/pointer specs each pin ONE interleaving; this deck-deals
  * all of them in seeded-random ORDER against the same version-history
  * window oracle, because the bugs these paths grow are interaction
  * bugs (a torn pointer right after a drift failure, a failed publish
  * whose retry crosses a column add, a tie row flushed by a bootstrap
  * instead of a bump).
  *
  * Per seed, a shuffled 22-op deck guarantees coverage of every op kind
  * while fuzzing the interleaving:
  *  - churn: updates + inserts, fresh MERGE manager per cycle
  *    (watermark durability is part of the claim);
  *  - nochange: empty delta — watermark must not move;
  *  - tie: a row stamped EXACTLY at the watermark — invisible to the
  *    strict-> delta scan until a later bump or a bootstrap full read
  *    flushes it (both modeled);
  *  - add: mid-churn column add — adopted, NULL for rows the delta
  *    never re-read;
  *  - drop: dropped column — cycle fails with the named remedy,
  *    watermark + pointer hold, one FullRebuild recovers;
  *  - retype: retyped column — same failure contract, then the source
  *    is reverted (the rolled-back-bad-deploy shape) and life goes on;
  *  - torn/absent pointer: Merge degrades to a bootstrap full read and
  *    its publish self-heals the pointer;
  *  - failpub: the previous generation is damaged so the publish
  *    fails AFTER change detection — watermark and pointer must hold,
  *    the repaired retry must land the delta exactly once.
  *
  * Oracle: latest-version-per-id over the archived delta history (a
  * window-rank formulation sharing no code with SyncManager's
  * anti-join MERGE), projected down by dropped columns; compared by
  * order-insensitive digest against BOTH the final published snapshot
  * and the fuzzer's own source-maintenance bookkeeping — three
  * independently-computed states that must agree. Every op also
  * asserts the published generation reads back at exactly its manifest
  * count (the pointer never names a torn generation).
  */
class SyncFuzzSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def digest(df: DataFrame): (Long, java.math.BigDecimal) = {
    val row = df.select(
      count(lit(1)).as("n"),
      sum(xxhash64(df.columns.sorted.map(col).toSeq: _*)
        .cast("decimal(38,0)")).as("h")).collect()(0)
    (row.getLong(0), row.getDecimal(1))
  }

  private def scenario(seed: Int): Unit = {
    val rng = new scala.util.Random(seed)
    val srcDir = Files.createTempDirectory(s"graft-sfz$seed-src").toString
    val snapDir = Files.createTempDirectory(s"graft-sfz$seed-snap").toString
    val archDir = Files.createTempDirectory(s"graft-sfz$seed-arch").toString
    val store = new SnapshotStore(spark, snapDir)
    def mergeMgr() = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("orders")), store, mode = SyncMode.Merge)
    def fullMgr() = new SyncManager(spark,
      new ParquetSource(srcDir, Seq("orders")), store,
      mode = SyncMode.FullRebuild)

    def source() = spark.read.parquet(s"$srcDir/orders.parquet")
    def replaceSource(next: DataFrame): Unit = {
      val tmp = s"$srcDir/__next"
      next.write.mode(SaveMode.Overwrite).parquet(tmp)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      val dest = new org.apache.hadoop.fs.Path(s"$srcDir/orders.parquet")
      fs.delete(dest, true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), dest)
    }

    // ── state ────────────────────────────────────────────────────────
    var cycleIdx = 0
    var nVersions = 0
    var extraCols = Vector.empty[String]
    var droppedCols = Vector.empty[String]
    var pendingTies = Vector.empty[Long] // stamped AT wm, never consumed
    var extraSeq = 0
    def ts(k: Int) = f"2030-01-${1 + k / 24}%02d ${k % 24}%02d:00:00"
    def storedWm: String = new WatermarkStore(store).load()("orders")

    def archive(delta: DataFrame): Unit = {
      delta.write.parquet(s"$archDir/v$nVersions")
      nVersions += 1
      val ids = spark.read.parquet(s"$archDir/v${nVersions - 1}")
        .select("id").collect().map(_.getLong(0)).toSet
      pendingTies = pendingTies.filterNot(ids) // a bump consumes a tie
    }
    /** A bootstrap full read publishes EVERYTHING in the source —
      * including tie rows the delta scan never consumed; flush them
      * into the oracle history at their tie timestamps. */
    def flushTies(): Unit = if (pendingTies.nonEmpty) {
      val tieDf = source().filter(col("id").isin(pendingTies: _*))
      tieDf.write.parquet(s"$archDir/v$nVersions")
      nVersions += 1
      pendingTies = Vector.empty
    }

    def genIntegrity(): Unit = {
      val m = store.readCurrentManifest().get
      val n = spark.read.parquet(
        store.tableDir(m.version, "orders").toString).count()
      assert(n == m.tables("orders"),
        s"generation ${m.version} torn: parquet=$n manifest=${m.tables("orders")}")
    }

    /** updates (core-col churn, extras ride along) + inserts (fresh
      * ids; live extras null unless this delta introduces `newCol`). */
    def makeDelta(opIdx: Int, newCol: Option[String]): DataFrame = {
      cycleIdx += 1
      val tsK = ts(cycleIdx)
      val cur = source()
      val m = 101 + rng.nextInt(300)
      val r = rng.nextInt(m)
      var updates = cur
        .filter(col("id") % m === r)
        .withColumn("updated_at", to_timestamp(lit(tsK)))
        .withColumn("o_totalprice", col("o_totalprice") + cycleIdx * 10.0)
      newCol.foreach { c =>
        updates = updates.withColumn(c, concat(lit("v"), col("id")))
      }
      val base = 100000000L + opIdx * 10000L
      var inserts = spark.range(50 + rng.nextInt(100)).select(
        (lit(base) + col("id")).as("id"),
        to_timestamp(lit(tsK)).as("updated_at"),
        (col("id") % 1000).as("o_custkey"),
        lit("N").as("o_orderstatus"),
        ((lit(base) + col("id")) * 1.25).as("o_totalprice"))
      extraCols.foreach { c =>
        inserts = inserts.withColumn(c,
          if (newCol.contains(c)) concat(lit("i"), col("id"))
          else lit(null).cast("string"))
      }
      newCol.filterNot(extraCols.contains).foreach { c =>
        inserts = inserts.withColumn(c, concat(lit("i"), col("id")))
      }
      updates.unionByName(inserts, allowMissingColumns = true)
    }

    /** Archive + apply to source, run one MERGE cycle, assert the full
      * delta was consumed and the watermark landed on this cycle's ts. */
    def churnCycle(opIdx: Int, newCol: Option[String] = None): Unit = {
      val delta = makeDelta(opIdx, newCol)
      archive(delta)
      val deltaDisk = spark.read.parquet(s"$archDir/v${nVersions - 1}")
      val nDelta = deltaDisk.count()
      replaceSource(source()
        .join(deltaDisk.select("id"), Seq("id"), "left_anti")
        .unionByName(deltaDisk, allowMissingColumns = true))
      val r = mergeMgr().runCycle()
      assert(r.success, s"churn cycle failed: ${r.error}")
      assert(r.changedCounts("orders") == nDelta,
        s"changed=${r.changedCounts("orders")} expected=$nDelta")
      assert(storedWm == ts(cycleIdx),
        s"watermark ${storedWm} != ${ts(cycleIdx)}")
      genIntegrity()
    }

    // ── seed data: sf0.01 orders under the id/updated_at convention ──
    val initial = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("id"),
        col("o_orderdate").cast("timestamp").as("updated_at"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    initial.write.parquet(s"$srcDir/orders.parquet")
    initial.write.parquet(s"$archDir/v$nVersions")
    nVersions += 1
    val n0 = source().count()
    val r0 = mergeMgr().runCycle()
    assert(r0.success && r0.manifest.get.tables("orders") == n0, r0.error)

    // ── the deck: every op kind present, seeded-random order ─────────
    val deck = rng.shuffle(Seq.fill(8)("churn") ++ Seq.fill(2)("nochange") ++
      Seq.fill(2)("tie") ++ Seq.fill(2)("add") ++ Seq.fill(2)("drop") ++
      Seq("retype") ++ Seq.fill(2)("torn") ++ Seq("absent") ++
      Seq.fill(2)("failpub"))
    info(s"seed $seed deck: ${deck.mkString(" ")}")

    deck.zipWithIndex.foreach { case (op, opIdx) =>
      op match {
        case "churn" => churnCycle(opIdx)

        case "nochange" =>
          val wmBefore = storedWm
          val r = mergeMgr().runCycle()
          assert(r.success && r.changedCounts("orders") == 0L,
            s"no-change cycle saw changes: $r")
          assert(storedWm == wmBefore, "watermark moved on an empty delta")
          genIntegrity()

        case "tie" =>
          val wm = storedWm
          val tieId = 200000000L + opIdx
          var tie = spark.range(1).select(
            lit(tieId).as("id"),
            to_timestamp(lit(wm)).as("updated_at"),
            lit(7L).as("o_custkey"), lit("T").as("o_orderstatus"),
            lit(42.5).as("o_totalprice"))
          extraCols.foreach(c =>
            tie = tie.withColumn(c, lit(null).cast("string")))
          replaceSource(source().unionByName(tie))
          val r = mergeMgr().runCycle()
          assert(r.success, r.error)
          assert(r.changedCounts("orders") == 0L,
            "strict-> scan consumed a row stamped AT the watermark")
          val snap = spark.read.parquet(store.tableDir(
            r.manifest.get.version, "orders").toString)
          assert(snap.filter(col("id") === tieId).count() == 0,
            "tie row leaked into a MERGE snapshot")
          assert(storedWm == wm)
          pendingTies :+= tieId
          genIntegrity()

        case "add" =>
          extraSeq += 1
          val c = s"c$extraSeq"
          // old source rows gain the column as NULL (the delta is the
          // only carrier of real values this cycle)
          replaceSource(source().withColumn(c, lit(null).cast("string")))
          churnCycle(opIdx, newCol = Some(c))
          extraCols :+= c
          val snap = spark.read.parquet(store.tableDir(
            store.readCurrentManifest().get.version, "orders").toString)
          assert(snap.columns.contains(c),
            "added column did not appear in the next snapshot")

        case "drop" if extraCols.nonEmpty =>
          val c = extraCols(rng.nextInt(extraCols.size))
          val wmBefore = storedWm
          val genBefore = store.readCurrentManifest().get.version
          val delta = makeDelta(opIdx, None).drop(c)
          archive(delta) // consumed by the FullRebuild below
          val deltaDisk = spark.read.parquet(s"$archDir/v${nVersions - 1}")
          replaceSource(source()
            .join(deltaDisk.select("id"), Seq("id"), "left_anti")
            .unionByName(deltaDisk, allowMissingColumns = true)
            .drop(c))
          val rFail = mergeMgr().runCycle()
          assert(!rFail.success, "dropped-column MERGE cycle must fail")
          assert(rFail.error.exists(e => e.contains("SchemaDrift") &&
            e.contains(c) && e.contains("FullRebuild")),
            s"drift error lacks the diagnosis: ${rFail.error}")
          assert(storedWm == wmBefore, "watermark moved on a drift failure")
          assert(store.readCurrentManifest().get.version == genBefore,
            "a failed drift cycle published")
          flushTies() // the rebuild reads the full source
          val rFull = fullMgr().runCycle()
          assert(rFull.success, s"FullRebuild recovery failed: ${rFull.error}")
          assert(storedWm == ts(cycleIdx))
          val snap = spark.read.parquet(store.tableDir(
            rFull.manifest.get.version, "orders").toString)
          assert(!snap.columns.contains(c), "dropped column survived")
          extraCols = extraCols.filterNot(_ == c)
          droppedCols :+= c
          genIntegrity()
        case "drop" => churnCycle(opIdx) // nothing to drop yet

        case "retype" if extraCols.nonEmpty =>
          val c = extraCols(rng.nextInt(extraCols.size))
          val wmBefore = storedWm
          val genBefore = store.readCurrentManifest().get.version
          // park the good source, publish a retyped one (bad deploy)
          val aside = s"$srcDir/__aside"
          source().write.parquet(aside)
          replaceSource(spark.read.parquet(aside)
            .withColumn(c, xxhash64(col(c)).cast("double")))
          val rFail = mergeMgr().runCycle()
          assert(!rFail.success, "retyped-column MERGE cycle must fail")
          assert(rFail.error.exists(e => e.contains("SchemaDrift") &&
            e.contains(c)), s"drift error lacks the diagnosis: ${rFail.error}")
          assert(storedWm == wmBefore && store.readCurrentManifest()
            .get.version == genBefore, "retype failure was not clean")
          // roll the deploy back — exact bytes, no information loss
          replaceSource(spark.read.parquet(aside))
          org.apache.hadoop.fs.FileSystem.getLocal(
            spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(aside), true)
          val rOk = mergeMgr().runCycle()
          assert(rOk.success && rOk.changedCounts("orders") == 0L,
            s"post-revert cycle not clean: $rOk")
          genIntegrity()
        case "retype" => churnCycle(opIdx)

        case "torn" | "absent" =>
          if (op == "torn") {
            val garbage = Seq("{not json", "",
              """{"timestamp":"t","snapshot_key":"k"}""",
              graft.model.Manifest.toJson(store.readCurrentManifest().get)
                .take(30))(rng.nextInt(4))
            store.writeString(store.currentManifestPath, garbage)
          } else {
            assert(store.fs.delete(store.currentManifestPath, false))
          }
          flushTies() // the bootstrap reads the full source
          churnCycle(opIdx) // Merge degrades to bootstrap; publish heals
          assert(store.readCurrentManifest().nonEmpty,
            "publish did not heal the pointer")

        case "failpub" =>
          val wmBefore = storedWm
          val genBefore = store.readCurrentManifest().get
          val delta = makeDelta(opIdx, None)
          archive(delta) // lands on the retry below
          val deltaDisk = spark.read.parquet(s"$archDir/v${nVersions - 1}")
          val nDelta = deltaDisk.count()
          replaceSource(source()
            .join(deltaDisk.select("id"), Seq("id"), "left_anti")
            .unionByName(deltaDisk, allowMissingColumns = true))
          // damage the previous generation so the MERGE read fails
          // AFTER change detection computed the would-be watermark
          val fs = org.apache.hadoop.fs.FileSystem.getLocal(
            spark.sparkContext.hadoopConfiguration)
          val genTable = store.tableDir(genBefore.version, "orders")
          val aside = new org.apache.hadoop.fs.Path(genTable.toString + ".aside")
          assert(fs.rename(genTable, aside))
          val rFail = mergeMgr().runCycle()
          assert(!rFail.success, "cycle succeeded against a damaged prev")
          assert(storedWm == wmBefore,
            "watermark advanced past a FAILED publish — rows in " +
              "(old, new] would be skipped forever")
          assert(store.readCurrentManifest().get.version == genBefore.version)
          assert(fs.rename(aside, genTable))
          val rRetry = mergeMgr().runCycle()
          assert(rRetry.success, s"repaired retry failed: ${rRetry.error}")
          assert(rRetry.changedCounts("orders") == nDelta,
            s"retry consumed ${rRetry.changedCounts("orders")} of $nDelta")
          assert(storedWm == ts(cycleIdx))
          genIntegrity()
      }
    }

    // ── convergence: bump outstanding ties, then the window oracle ──
    if (pendingTies.nonEmpty) {
      cycleIdx += 1
      val tsK = ts(cycleIdx)
      val bump = source().filter(col("id").isin(pendingTies: _*))
        .withColumn("updated_at", to_timestamp(lit(tsK)))
      archive(bump)
      val bumpDisk = spark.read.parquet(s"$archDir/v${nVersions - 1}")
      replaceSource(source()
        .join(bumpDisk.select("id"), Seq("id"), "left_anti")
        .unionByName(bumpDisk, allowMissingColumns = true))
      val r = mergeMgr().runCycle()
      assert(r.success, r.error)
      assert(pendingTies.isEmpty, "bump did not consume the tie rows")
    }

    val history = (0 until nVersions)
      .map(v => spark.read.parquet(s"$archDir/v$v"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val expected = history
      .withColumn("__rk", row_number().over(
        Window.partitionBy("id").orderBy(col("updated_at").desc)))
      .filter(col("__rk") === 1).drop("__rk")
      .drop(droppedCols: _*)
    val finalSnap = spark.read.parquet(store.tableDir(
      store.readCurrentManifest().get.version, "orders").toString)
    val src = source()
    val (en, eh) = digest(expected)
    val (gn, gh) = digest(finalSnap)
    val (sn, sh) = digest(src)
    assert(en == gn && eh == gh,
      s"seed $seed: snapshot diverged from the version-history oracle: " +
        s"expected ($en, $eh) got ($gn, $gh)")
    assert(sn == gn && sh == gh,
      s"seed $seed: snapshot diverged from the source bookkeeping: " +
        s"source ($sn, $sh) snapshot ($gn, $gh)")
    info(s"seed $seed: ${deck.size} ops, $nVersions versions, " +
      s"$en rows converged")
  }

  // two always-run seeds; override to widen locally:
  //   GRAFT_SYNC_FUZZ_SEEDS=7,8,9 sbt "testOnly graft.ingest.SyncFuzzSpec"
  private val seeds = sys.env.get("GRAFT_SYNC_FUZZ_SEEDS")
    .map(_.split(",").map(_.trim.toInt).toSeq)
    .getOrElse(Seq(20260815, 424242))

  seeds.foreach { s =>
    test(s"seeded sync-lifecycle scenario converges to the window oracle (seed $s)") {
      scenario(s)
    }
  }
}

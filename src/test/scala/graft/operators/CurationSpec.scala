package graft.operators

import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank"), // exact dup
    (3L, "The quick brown fox jumps over the lazy cat near the river bank"), // near dup
    (4L, "Completely different prose about the behavior of distributed query engines"),
    (5L, "!!! ??? *** $$$ ### @@@ %%% &&&"))                                 // junk
    .toDF("doc_id", "text")

  test("curation drops junk, exact dups, and near dups; keeps min ids") {
    val out = Curation.curate(docs, "doc_id", "text",
      minQuality = 0.5, nearDupThreshold = 0.45)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 4L), s"survivors: $out")
  }

  test("report counts each stage") {
    val r = Curation.report(docs, "doc_id", "text",
      minQuality = 0.5, nearDupThreshold = 0.45)
    assert(r.input == 5)
    assert(r.afterQuality == 4)  // junk gone
    assert(r.afterExact == 3)    // exact dup gone
    assert(r.afterNearDup == 2)  // near dup gone
  }

  test("concurrent curate calls don't disturb each other") {
    // round-1 regression: a JVM-global persist ref let two in-flight
    // curate() pipelines unpersist each other's cached survivors
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Future.sequence((1 to 4).map { _ =>
      Future {
        Curation.curate(docs, "doc_id", "text",
          minQuality = 0.5, nearDupThreshold = 0.45)
          .select("doc_id").as[Long].collect().sorted.toSeq
      }
    })
    Await.result(runs, 120.seconds).foreach { out =>
      assert(out == Seq(1L, 4L), s"concurrent curate diverged: $out")
    }
  }

  test("curateManaged cleanup releases the cached survivors") {
    import org.apache.spark.sql.functions.lit
    val (out, cleanup) = Curation.curateManaged(docs, "doc_id", "text",
      minQuality = 0.5, nearDupThreshold = 0.45)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // a FRESH query execution resolves against the cache manager at
    // plan time — before cleanup it reads the in-memory relation,
    // after cleanup the entry is gone and the plan recomputes
    def usesCache: Boolean = out.where(lit(true))
      .queryExecution.executedPlan.toString.contains("InMemoryTableScan")
    assert(usesCache, "survivors frame should be cached after the action")
    cleanup()
    val deadline = System.currentTimeMillis() + 30000
    while (usesCache && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(!usesCache, "cleanup must release the cache entry")
    // and the result stays computable (lineage intact, just uncached)
    assert(out.where(lit(true)).count() == 2L)
  }

  test("transitive mode keeps one representative per similarity cluster") {
    // V shape: docs 1 and 2 each overlap doc 3 heavily but barely
    // overlap each other. The pair rule only ever drops the HIGHER id
    // of a pair — pairs (1,3) and (2,3) both drop 3, keeping 1 AND 2.
    // Transitive clustering sees one component {1,2,3} and keeps 1.
    // fixture chosen so the FIXED banding family detects exactly the
    // pairs (1,3) and (2,3) — minhash collision is deterministic per
    // content, so this is stable, but edit the words only with care
    val head = (1 to 30).map(i => s"alpha1x$i").mkString(" ")
    val ub = (1 to 12).map(i => s"beta1x$i").mkString(" ")
    val vb = (1 to 12).map(i => s"gamma1x$i").mkString(" ")
    val d1 = (1 to 12).map(i => s"delta1x$i").mkString(" ")
    val d2 = (1 to 12).map(i => s"epsil1x$i").mkString(" ")
    val v = Seq(
      (1L, s"$head $ub $d1"),
      (2L, s"$head $vb $d2"),
      (3L, s"$head $ub $vb"))
      .toDF("doc_id", "text")
    def run(transitive: Boolean) =
      Curation.curate(v, "doc_id", "text", minQuality = 0.0,
        nearDupThreshold = 0.4, transitive = transitive)
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(run(transitive = false) == Seq(1L, 2L))
    assert(run(transitive = true) == Seq(1L))
  }

  test("language gate") {
    val mixed = Seq(
      (1L, "the cat sat on the mat and it was happy with the sun in the sky"),
      (2L, "der Hund und die Katze sind nicht mit der Maus auf dem Tisch heute"))
      .toDF("doc_id", "text")
    val out = Curation.curate(mixed, "doc_id", "text",
      minQuality = 0.0, keepLangs = Some(Set("en")))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}

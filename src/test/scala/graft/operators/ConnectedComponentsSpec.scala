package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(pairs.toDF("id_a", "id_b"),
      "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("transitive chain collapses to one component") {
    // A~B, B~C but never A~C: the pair-based rule gets this wrong,
    // clustering must not
    assert(cc(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("disjoint components keep distinct representatives") {
    assert(cc(Seq((5L, 6L), (10L, 12L), (12L, 11L))) ==
      Map(5L -> 5L, 6L -> 5L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("duplicate and reversed edges are harmless") {
    assert(cc(Seq((2L, 1L), (1L, 2L), (2L, 1L))) == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge list yields an empty result") {
    assert(cc(Seq.empty) == Map.empty)
  }

  test("a path propagates the min across its full length") {
    // diameter = path length: the slowest-converging shape
    val path = (0L until 10L).map(i => (i, i + 1))
    assert(cc(path) == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("clusters() attaches component sizes") {
    val rows = ConnectedComponents.clusters(
      Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b"),
      "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }

  test("dedupSurvivors keeps exactly one representative per component") {
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = ConnectedComponents.dedupSurvivors(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // {1,2,3} -> 1, {5,6} -> 5, 4 untouched
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("property: components match a union-find reference on random graphs") {
    // reference: plain driver-side union-find with path compression
    def reference(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    val edgeGen = for {
      n <- Gen.choose(2, 12) // node universe
      m <- Gen.choose(1, 15) // edges
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield es
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAll(edgeGen) { es => cc(es) == reference(es) })
    assert(res.passed, res.status.toString)
  }
}

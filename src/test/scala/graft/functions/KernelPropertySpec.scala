package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Property tests of the sketch kernels at the expression level — no
  * Spark jobs, direct nullSafeEval, thousands of cases per second.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val doc: Gen[String] = Gen.choose(5, 60)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  private def minhash(s: String): Array[Long] =
    MinHashSignature(Literal(s), 2, 64).nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[ArrayData].toLongArray()

  private def shingleSet(s: String): Set[Long] =
    ShingleHashSet(Literal(s), 2).nullSafeEval(UTF8String.fromString(s))
      .asInstanceOf[ArrayData].toLongArray().toSet

  private def simhash(toks: Seq[String]): Long =
    SimHash64(Literal(null)).nullSafeEval(new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any]))
      .asInstanceOf[java.lang.Long].longValue()

  test("minhash estimate tracks exact jaccard within 3 sigma") {
    check(Prop.forAll(doc, doc) { (a, b) =>
      val sa = shingleSet(a); val sb = shingleSet(b)
      val exact =
        if ((sa ++ sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      val (ma, mb) = (minhash(a), minhash(b))
      val est = ma.zip(mb).count { case (x, y) => x == y }.toDouble / ma.length
      // σ = sqrt(j(1-j)/k) ≤ 0.5/8 at k=64; allow 3σ + slack
      math.abs(est - exact) <= 3 * 0.0625 + 0.02
    })
  }

  test("minhash signature is deterministic and permutation-invariant on the set") {
    check(Prop.forAll(doc) { a =>
      java.util.Arrays.equals(minhash(a), minhash(a))
    })
  }

  test("identical docs: est=1; disjoint docs: low est") {
    check(Prop.forAll(doc) { a =>
      val m = minhash(a)
      m.sameElements(minhash(a))
    })
    // disjoint vocabularies can't agree on more than chance
    val upper = doc.map(_.toUpperCase.replace(' ', '9')) // different tokens
    check(Prop.forAll(doc) { a =>
      val other = a.split(' ').map(w => w + "zz9").mkString(" ")
      val est = minhash(a).zip(minhash(other))
        .count { case (x, y) => x == y }.toDouble / 64
      est <= 0.25
    })
  }

  test("simhash: hamming 0 on identity; small perturbation → small distance") {
    check(Prop.forAll(Gen.listOfN(30, word)) { toks =>
      val base = simhash(toks)
      simhash(toks) == base && {
        val perturbed = simhash(toks.updated(0, toks.head + "x"))
        java.lang.Long.bitCount(base ^ perturbed) <= 28
      }
    })
  }

  test("mink sketch: equal on identity, stable under suffix beyond cap") {
    val mk = MinKSketch64(Literal(""), 8, 8, 64)
    def fp(s: String): Long =
      mk.nullSafeEval(UTF8String.fromString(s)).asInstanceOf[java.lang.Long]
    check(Prop.forAll(doc) { a =>
      fp(a) == fp(a) && (a.length < 64 || fp(a) == fp(a + " trailing junk"))
    })
  }

  test("langid kernel agrees with itself and handles adversarial input") {
    val li = LangIdExpr(Literal(""), 0.02)
    def id(s: String): String =
      li.nullSafeEval(UTF8String.fromString(s)).toString
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val a = id(s); a == id(s) &&
        (a == "und" || a == "zh" || a == "ja" || a == "ko" ||
          TextFunctions.stopwordProfiles.contains(a))
    })
  }

  test("top-k buffer: any insert/merge split == sorted reference") {
    val entry = for {
      score <- Gen.chooseNum(-1.0, 1.0)
      id <- Gen.chooseNum(0L, 40L) // small range → frequent dup ids
    } yield (score, id)
    val gen = for {
      xs <- Gen.listOf(entry)
      k <- Gen.choose(1, 12)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, k, cut)
    check(Prop.forAll(gen) { case (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut)
      val a = new TopKBuffer(k); l.foreach { case (s, i) => a.insert(s, i) }
      val b = new TopKBuffer(k); r.foreach { case (s, i) => b.insert(s, i) }
      // exercise serialize → deserialize on one side before merging
      val agg = TopKByScore(Literal(0.0), Literal(0L), k)
      val merged = agg.merge(a, agg.deserialize(agg.serialize(b)))
      val got = merged.sorted.map(c => (c.score, c.id)).toSeq
      // reference: best score per id, ranked (score desc, id asc), take k
      // (.toSeq BEFORE map — mapping the Map would re-key by score and
      // collapse ties)
      val ref = xs.groupBy(_._2).toSeq
        .map { case (id, es) => (es.map(_._1).max, id) }
        .sortBy { case (s, i) => (-s, i) }.take(k)
      got == ref
    })
  }

  test("min-keys buffer: any insert/merge split == sorted reference") {
    val gen = for {
      xs <- Gen.listOf(Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString))
      k <- Gen.choose(1, 10)
      cut <- Gen.choose(0, xs.length)
    } yield (xs, k, cut)
    check(Prop.forAll(gen) { case (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut)
      val a = new MinKeysBuffer(k)
      l.foreach(s => a.insert(UTF8String.fromString(s)))
      val b = new MinKeysBuffer(k)
      r.foreach(s => b.insert(UTF8String.fromString(s)))
      val agg = MinKeys(Literal(""), k)
      val merged = agg.merge(a, agg.deserialize(agg.serialize(b)))
      val got = merged.sorted.map(_.toString).toSeq
      got == xs.sorted.take(k) // ascii → String order == UTF8String order
    })
  }
}

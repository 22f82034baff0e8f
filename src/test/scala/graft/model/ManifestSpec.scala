package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ManifestSpec extends AnyFunSuite {

  private val nameGen = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val manifestGen: Gen[Manifest] = for {
    version <- nameGen
    ts <- nameGen
    key <- nameGen
    tables <- Gen.mapOf(Gen.zip(nameGen, Gen.choose(0L, Long.MaxValue)))
    meta <- Gen.mapOf(Gen.zip(nameGen, nameGen))
  } yield Manifest(version, ts, key, tables, meta)

  test("property: JSON round-trip is the identity") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(manifestGen) { m =>
        Manifest.fromJson(Manifest.toJson(m)) == m
      })
    assert(res.passed, res.status.toString)
  }

  test("missing optional fields tolerate absence") {
    val m = Manifest.fromJson(
      """{"version":"v1","timestamp":"t","snapshot_key":"k"}""")
    assert(m.tables.isEmpty && m.metadata.isEmpty)
  }
}

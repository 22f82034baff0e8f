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
    epoch <- Gen.choose(0L, Long.MaxValue)
  } yield Manifest(version, ts, key, tables, meta, epoch)

  test("property: JSON round-trip is the identity") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(manifestGen) { m =>
        Manifest.fromJson(Manifest.toJson(m)) == m
      })
    assert(res.passed, res.status.toString)
  }

  test("missing optional fields tolerate absence") {
    // pre-epoch manifests (no publisher_epoch) parse with epoch 0, so
    // every claimed epoch (≥1) outranks them — back-compat is what
    // makes the fence adoptable on a store with existing history
    val m = Manifest.fromJson(
      """{"version":"v1","timestamp":"t","snapshot_key":"k"}""")
    assert(m.tables.isEmpty && m.metadata.isEmpty && m.publisherEpoch == 0L)
  }

  test("strict parse: every shape defect is a typed MalformedManifest") {
    // the torn-pointer taxonomy depends on this: SyncManager and
    // SnapshotReader heal/degrade ONLY on MalformedManifest, so every
    // parse-shaped defect must surface as that type — an NPE or a raw
    // Jackson type escaping here would be misclassified as a code bug
    // and wedge the publisher (the exact regression r10's torn-pointer
    // spec originally found)
    val defects = Seq(
      "" -> "empty file (torn at byte 0)",
      "{not json" -> "garbage",
      """{"version":"v1","timestamp":"t""" -> "truncated mid-field",
      """{"version":"v1","snapshot_key":"k","timestamp":"t","tables":{"a":1}""" ->
        "truncated at the closing brace",
      "42" -> "non-object root",
      "[1,2]" -> "array root",
      "null" -> "null root",
      """{"timestamp":"t","snapshot_key":"k"}""" -> "missing version",
      """{"version":"v1","snapshot_key":"k"}""" -> "missing timestamp",
      """{"version":"v1","timestamp":"t"}""" -> "missing snapshot_key",
      """{"version":7,"timestamp":"t","snapshot_key":"k"}""" ->
        "mistyped version",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","tables":{"a":"x"}}""" ->
        "non-integral row count",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","tables":{"a":1.5}}""" ->
        "fractional row count",
      // valid-JSON corruption: present-but-mistyped optional fields
      // must classify as torn, not parse as a zero-table manifest the
      // reader would adopt (r11 ADVICE low)
      """{"version":"v1","timestamp":"t","snapshot_key":"k","tables":[]}""" ->
        "tables is an array, not an object",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","tables":"x"}""" ->
        "tables is a string",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","metadata":[1]}""" ->
        "metadata is an array",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","metadata":{"a":7}}""" ->
        "non-textual metadata value",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","metadata":{"a":null}}""" ->
        "null metadata value",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","publisher_epoch":"x"}""" ->
        "non-numeric publisher_epoch",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","publisher_epoch":1.5}""" ->
        "fractional publisher_epoch",
      """{"version":"v1","timestamp":"t","snapshot_key":"k","publisher_epoch":-1}""" ->
        "negative publisher_epoch")
    defects.foreach { case (json, what) =>
      val e = intercept[Exception](Manifest.fromJson(json))
      assert(e.isInstanceOf[MalformedManifest],
        s"$what raised ${e.getClass.getName} instead of MalformedManifest: $e")
    }
  }

  test("property: arbitrary byte garbage never escapes as anything but MalformedManifest") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(Gen.listOf(Gen.choose(0, 255)).map(
        _.map(_.toChar).mkString)) { s =>
        try { Manifest.fromJson(s); true } // a parse is fine if it validates
        catch {
          case _: MalformedManifest => true
          case _: Throwable => false
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("property: a PREFIX of a valid manifest (torn write) is always MalformedManifest or a valid parse") {
    // rename-based swaps make torn bytes unlikely but a foreign
    // non-atomic writer can still leave any prefix; all of them must
    // classify as parse-shaped
    val full = Manifest.toJson(Manifest("v1", "2024-01-01T00:00:00Z",
      "20240101_000000000", Map("inventory" -> 42L, "orders" -> 7L),
      Map("source" -> "test")))
    (0 until full.length).foreach { n =>
      val torn = full.take(n)
      try Manifest.fromJson(torn)
      catch {
        case _: MalformedManifest => ()
        case e: Throwable =>
          fail(s"prefix of length $n raised ${e.getClass.getName}: $e")
      }
    }
  }
}

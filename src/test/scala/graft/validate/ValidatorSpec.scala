package graft.validate

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ValidatorSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ── the reference's own unit tests, ported verbatim
  //    (etl-service/tests/test_sync.py:28-42) ──────────────────────────
  test("reference positive cases") {
    assert(QueryValidator.validate("SELECT * FROM inventory").valid)
    assert(QueryValidator.validate("SELECT COUNT(*) FROM products").valid)
  }

  test("reference negative cases") {
    assert(!QueryValidator.validate("INSERT INTO table VALUES (1)").valid)
    assert(!QueryValidator.validate("DROP TABLE inventory").valid)
  }

  // ── whitelist pattern attribution + caps (query_whitelist.json) ─────
  test("pattern names and row caps") {
    val r = QueryValidator.validate("SELECT * FROM lineitem")
    assert(r.pattern.contains("select_all") && r.maxRows.contains(10000))
    val c = QueryValidator.validate("SELECT COUNT(*) FROM lineitem")
    assert(c.pattern.contains("count") && c.maxRows.contains(1))
    val a = QueryValidator.validate("SELECT SUM(l_quantity) FROM lineitem")
    assert(a.pattern.contains("aggregate") && a.maxRows.contains(1000))
  }

  // ── prefix-match permissiveness (SURVEY.md §2.3): joins/windows/
  //    subqueries ARE admitted ──────────────────────────────────────────
  test("de facto surface: joins, windows, HAVING admitted") {
    assert(QueryValidator.validate(
      "SELECT * FROM orders JOIN customer ON o_custkey = c_custkey").valid)
    assert(QueryValidator.validate(
      "SELECT c FROM t WHERE x > (SELECT AVG(x) FROM t)").valid)
    // windows are admitted when the query tail matches a prefix shape
    // (here: order_by); a bare window projection with no WHERE/GROUP/
    // ORDER/LIMIT tail matches NO pattern and is rejected — reference
    // quirk, replicated (parens break the select_columns char class)
    assert(QueryValidator.validate(
      "SELECT a, ROW_NUMBER() OVER (ORDER BY b) AS rn FROM t ORDER BY rn").valid)
    assert(!QueryValidator.validate(
      "SELECT a, ROW_NUMBER() OVER (ORDER BY b) FROM t").valid)
    assert(QueryValidator.validate(
      "SELECT a FROM t GROUP BY a HAVING COUNT(*) > 1").valid)
    assert(QueryValidator.validate(
      "SELECT a FROM t INTERSECT SELECT a FROM u").valid)
  }

  test("CTEs rejected (fail every ^SELECT anchor)") {
    assert(!QueryValidator.validate("WITH x AS (SELECT 1) SELECT * FROM x").valid)
  }

  test("blocked keywords anywhere, case-insensitive") {
    assert(!QueryValidator.validate("SELECT a FROM t UNION SELECT b FROM u").valid)
    assert(!QueryValidator.validate("select a from t union select b from u").valid)
    assert(!QueryValidator.validate("SELECT a FROM t; DROP TABLE t").valid)
    // \b-wrapped non-word tokens only fire against adjacent word chars —
    // reference quirk (re.compile(rf"\b{kw}\b")), replicated exactly:
    assert(!QueryValidator.validate("SELECT a FROM t WHERE x@@version").valid)
    assert(QueryValidator.validate("SELECT a FROM t WHERE x = @@version").valid)
    assert(!QueryValidator.validate("SELECT a FROM t;SELECT b FROM u").valid)
    assert(QueryValidator.validate("SELECT a FROM t; SELECT b FROM u").valid)
    // `\bxp_\b` needs a non-word char after the underscore, so the real
    // procedure name sails through — reference quirk, replicated
    assert(QueryValidator.validate("SELECT a FROM xp_cmdshell WHERE 1=1").valid)
    assert(!QueryValidator.validate("SELECT a FROM t WHERE xp_ = 1").valid)
  }

  test("length cap at 5000 chars") {
    val long = "SELECT " + ("a," * 2500) + "b FROM t"
    val r = QueryValidator.validate(long)
    assert(!r.valid && r.error.exists(_.contains("maximum length")))
  }

  test("sanitizer strips comments and collapses whitespace") {
    assert(QuerySanitizer.sanitize("SELECT /* hack */ a\n  FROM   t") ==
      "SELECT a FROM t")
    assert(QuerySanitizer.sanitize("SELECT a -- trailing\nFROM t") ==
      "SELECT a FROM t")
    assert(QuerySanitizer.sanitize("SELECT /* multi\nline */ a FROM t") ==
      "SELECT a FROM t")
  }

  // ── properties ──────────────────────────────────────────────────────
  private val anyQuery: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(s => s"SELECT $s FROM tbl"),
    Gen.alphaNumStr.map(s => s"INSERT INTO $s VALUES (1)"),
    Gen.alphaNumStr,
    Gen.oneOf(QueryValidator.blockedKeywords)
      .map(k => s"SELECT a FROM t WHERE $k x"))

  test("property: every admitted query starts with SELECT") {
    check(Prop.forAll(anyQuery) { q =>
      val r = QueryValidator.validate(q)
      !r.valid || q.trim.toUpperCase.startsWith("SELECT")
    })
  }

  test("property: no admitted query contains a standalone blocked word") {
    val wordKeywords = QueryValidator.blockedKeywords.filter(_.forall(_.isLetter))
    check(Prop.forAll(anyQuery) { q =>
      val r = QueryValidator.validate(q)
      !r.valid || !wordKeywords.exists(k =>
        q.toUpperCase.matches(s".*\\b$k\\b.*"))
    })
  }

  // ── CTE / set-op / comment permutations (reference re.match
  //    semantics: ^-anchored prefix + blocked-token search) ───────────
  private val wordBlocked =
    QueryValidator.blockedKeywords.filter(_.forall(_.isLetter)).map(_.toUpperCase).toSet
  private val ident: Gen[String] = Gen.identifier
    .map(_.take(8)).suchThat(s => s.nonEmpty && !wordBlocked(s.toUpperCase))
  private val simpleSelect: Gen[String] = for {
    proj <- Gen.oneOf(ident, Gen.const("*"))
    t <- ident
  } yield s"SELECT $proj FROM $t"

  test("property: every WITH/CTE form fails all ^SELECT anchors") {
    // Python re.match anchors at the start; `WITH name AS (...)` can
    // never satisfy a ^SELECT pattern regardless of the inner query
    val cte = for {
      n <- ident; inner <- simpleSelect
      outer <- Gen.oneOf(s"SELECT * FROM $n", s"SELECT COUNT(*) FROM $n")
      ws <- Gen.oneOf("", "  ", "\n")
    } yield s"${ws}WITH $n AS ($inner) $outer"
    check(Prop.forAll(cte) { q =>
      val r = QueryValidator.validate(q)
      !r.valid && r.error.contains("Query does not match any allowed pattern")
    })
  }

  test("property: INTERSECT/EXCEPT keep the left side's pattern; UNION is blocked") {
    val combined = for {
      l <- simpleSelect; r <- simpleSelect
      op <- Gen.oneOf("INTERSECT", "EXCEPT", "UNION",
        "intersect", "except", "union")
    } yield (l, op, s"$l ${op} $r")
    check(Prop.forAll(combined) { case (l, op, q) =>
      val r = QueryValidator.validate(q)
      if (op.equalsIgnoreCase("UNION"))
        // blocked-token search fires anywhere, case-insensitive
        !r.valid && r.error.contains("Query contains blocked keywords or patterns")
      else
        // prefix match: the whole set-op query is attributed to the
        // pattern the LEFT branch alone matches (first hit wins)
        r.valid && r.pattern == QueryValidator.validate(l).pattern
    })
  }

  test("property: comments sanitize away and cannot change the verdict") {
    val junk = Gen.alphaNumStr.map(_.take(20))
    val commented = for {
      q <- simpleSelect
      j <- junk
      style <- Gen.oneOf(0, 1, 2)
    } yield {
      val parts = q.split(' ')
      style match {
        case 0 => // block comment at a random-ish token boundary
          (q, (parts.init :+ s"/* $j */" :+ parts.last).mkString(" "))
        case 1 => (q, s"$q -- $j")       // trailing line comment
        case 2 => (q, s"/* $j\n$j */ $q") // leading multi-line block
      }
    }
    check(Prop.forAll(commented) { case (clean, dirty) =>
      val s = QuerySanitizer.sanitize(dirty)
      s == clean && QueryValidator.validate(s) == QueryValidator.validate(clean)
    })
  }
}

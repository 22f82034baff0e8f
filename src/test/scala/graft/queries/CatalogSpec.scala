package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: the driver contract depends on these invariants. */
class CatalogSpec extends AnyFunSuite {

  test("query names are unique") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.diff(names.distinct).mkString(","))
  }

  test("every oracle key has a query") {
    assert(Catalog.oracleSql.keySet.subsetOf(Catalog.queries.keySet))
  }

  test("oracle SQL is single-line, SELECT/WITH-shaped, unblocked") {
    Catalog.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\n"), s"$name oracle has newline")
      assert(sql.startsWith("SELECT") || sql.startsWith("WITH"),
        s"$name oracle shape")
      assert(!sql.contains(";"), s"$name oracle multi-statement")
    }
  }

  test("headline set is non-empty and all-oracle-or-deliberate") {
    assert(Catalog.headline.nonEmpty)
  }

  test("entry flagship query returns rows at sf0.001") {
    val df = graft.SparkEntry.entry(graft.SparkSpec.session)
    assert(df.count() > 0)
  }
}

package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Option("a"), Option(10.5)),
    (2L, Option("b"), None),
    (3L, Option("a"), Option(2.5)),
    (4L, None, Option(2.5))
  ).toDF("id", "s", "v")

  test("per-column rows/nulls/distinct/min/max in one aggregation") {
    val p = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    val s = p("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val v = p("v")
    assert(v.getLong(2) == 1L && v.getLong(3) == 2L)
    assert(v.getString(4) == "2.5" && v.getString(5) == "10.5")
  }

  test("complex columns profile nulls and distincts, min/max stay null") {
    val a = Seq((1L, Seq(1, 2)), (2L, Seq(1, 2)), (3L, Seq(3)))
      .toDF("id", "arr")
    val p = Profile.columnProfile(a).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("arr").getLong(3) == 2L)
    assert(p("arr").isNullAt(4) && p("arr").isNullAt(5))
  }

  test("approx mode still reports exact rows and nulls") {
    val p = Profile.columnProfile(df, approxDistinct = true).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 4L && p("s").getLong(2) == 1L)
    assert(p("id").getLong(3) == 4L) // HLL is exact at this cardinality
  }

  test("hashStrings counts string distincts on digests, same result") {
    val exact = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val hashed = Profile.columnProfile(df, hashStrings = true).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(exact == hashed)
  }
}

package graft.functions

import graft.SparkSpec

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String): (String, Long, Long, Long, Long) = {
    val r = Seq(text).toDF("t").select(
      Redaction.redact($"t").as("red"),
      Redaction.piiCounts($"t").as("c")).first()
    val c = r.getStruct(1)
    (r.getString(0), c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
  }

  test("emails, urls, ips, phones redacted and counted") {
    val (red, e, u, i, p) = run(
      "mail me at jane.doe+x@example.org or visit https://example.org/a?b=1 " +
        "from 192.168.1.100 or call +1 (555) 123-4567 thanks")
    assert(red == "mail me at <EMAIL> or visit <URL> from <IP> or call <PHONE> thanks", red)
    assert((e, u, i, p) == (1L, 1L, 1L, 1L))
  }

  test("clean text untouched") {
    val (red, e, u, i, p) = run("just ordinary prose with numbers 42 and 7")
    assert(red == "just ordinary prose with numbers 42 and 7")
    assert((e, u, i, p) == (0L, 0L, 0L, 0L))
  }

  test("isClean filter") {
    val docs = Seq(
      (1L, "clean words only"),
      (2L, "contact bob@corp.com now")).toDF("id", "t")
    val clean = docs.filter(Redaction.isClean($"t"))
      .select("id").as[Long].collect().toSeq
    assert(clean == Seq(1L))
  }
}

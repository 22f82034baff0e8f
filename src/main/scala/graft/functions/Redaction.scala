package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect/redact emails, URLs,
  * phone-ish numbers and IPv4 addresses with portable regexes (the
  * character-class subset that Java regex and RE2 interpret
  * identically). Pure `regexp_replace`/`regexp_count` composition —
  * codegen'd, no UDFs.
  */
object Redaction {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[^\\s]+"
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phoneRe = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

  /** Replace each PII category with its tag token. */
  def redact(text: Column): Column = {
    val noUrl = regexp_replace(text, urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Re, "<IP>")
    regexp_replace(noIp, phoneRe, "<PHONE>")
  }

  /** Per-category hit counts as a struct (audit/reporting). Categories
    * count on the same cascade `redact` applies (url → email → ip →
    * phone), so an IPv4 or digit-heavy URL is never double-counted by
    * the looser phone pattern.
    */
  def piiCounts(text: Column): Column = {
    val noUrl = regexp_replace(text, urlRe, "")
    val noEmail = regexp_replace(noUrl, emailRe, "")
    val noIp = regexp_replace(noEmail, ipv4Re, "")
    struct(
      regexp_count(noUrl, lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(urlRe)).cast("long").as("n_urls"),
      regexp_count(noEmail, lit(ipv4Re)).cast("long").as("n_ips"),
      regexp_count(noIp, lit(phoneRe)).cast("long").as("n_phones"))
  }

  /** True when the document carries no detectable PII. */
  def isClean(text: Column): Column = {
    val c = piiCounts(text)
    c.getField("n_emails") === 0 && c.getField("n_urls") === 0 &&
      c.getField("n_ips") === 0 && c.getField("n_phones") === 0
  }
}

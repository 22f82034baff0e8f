package graft.validate

import java.util.regex.Pattern

/** Validation outcome, mirroring the shared validator's return shape
  * (shared/utils/validators.py:37-61): `{valid, pattern?, error?}` plus
  * the matched pattern's declared row cap — which the reference declares
  * but never enforces (query_whitelist.json:7-49); this engine enforces
  * it (SURVEY.md §2.3 "declared-but-unenforced").
  */
final case class ValidationResult(
    valid: Boolean,
    pattern: Option[String] = None,
    maxRows: Option[Int] = None,
    error: Option[String] = None)

/** SQL whitelist validator porting shared/utils/validators.py:18-61 +
  * shared/schemas/query_whitelist.json semantics exactly:
  *
  *  - length cap first (5000 chars);
  *  - block-list: each keyword wrapped `\bKEYWORD\b` verbatim (raw, NOT
  *    regex-quoted — the reference interpolates the keyword into the
  *    regex unescaped, so the semicolon-star entry compiles as a
  *    semicolon followed by a quantified slash; replicated bug-for-bug),
  *    case-insensitive SEARCH anywhere in the string;
  *  - allow-list: case-insensitive PREFIX match (Python re.match anchors
  *    at start only) over the eight declared shapes, in declaration
  *    order; first hit wins and names the pattern / row cap.
  *
  * The prefix-match makes the de facto admitted surface the engine's
  * full SELECT dialect (joins, windows, subqueries, HAVING, DISTINCT…)
  * minus blocked tokens — SURVEY.md §2.3. CTEs (`WITH …`) fail every
  * `^SELECT` anchor and are rejected, as in the reference.
  */
object QueryValidator {
  val maxQueryLength = 5000
  val maxExecutionTimeSeconds = 30

  /** query_whitelist.json:52-69 — order and spelling preserved. */
  val blockedKeywords: Seq[String] = Seq(
    "INSERT", "UPDATE", "DELETE", "DROP", "CREATE", "ALTER", "TRUNCATE",
    "EXEC", "EXECUTE", "UNION", "--", ";/*", "xp_", "sp_", ";", "@@")

  private val blockedPatterns: Seq[Pattern] =
    blockedKeywords.map(k =>
      Pattern.compile("\\b" + k + "\\b", Pattern.CASE_INSENSITIVE))

  /** query_whitelist.json:3-50 — (name, pattern, max_rows). */
  val allowedQueries: Seq[(String, String, Int)] = Seq(
    ("select_all", "^SELECT\\s+\\*\\s+FROM\\s+(\\w+)", 10000),
    ("select_columns", "^SELECT\\s+([\\w\\s,]+)\\s+FROM\\s+(\\w+)", 10000),
    ("count", "^SELECT\\s+COUNT\\(\\*\\)\\s+FROM\\s+(\\w+)", 1),
    ("aggregate", "^SELECT\\s+(SUM|AVG|MIN|MAX|COUNT)\\s*\\(", 1000),
    ("group_by", "^SELECT\\s+.+\\s+FROM\\s+(\\w+)\\s+GROUP\\s+BY", 5000),
    ("where_clause", "^SELECT\\s+.+\\s+FROM\\s+(\\w+)\\s+WHERE", 5000),
    ("order_by", "^SELECT\\s+.+\\s+FROM\\s+(\\w+)\\s+ORDER\\s+BY", 5000),
    ("limit", "^SELECT\\s+.+\\s+FROM\\s+(\\w+)\\s+LIMIT\\s+(\\d+)", 10000))

  private val allowedPatterns: Seq[(String, Pattern, Int)] =
    allowedQueries.map { case (n, p, m) =>
      (n, Pattern.compile(p, Pattern.CASE_INSENSITIVE), m)
    }

  def validate(query: String): ValidationResult = {
    if (query.length > maxQueryLength)
      return ValidationResult(valid = false, error = Some(
        s"Query exceeds maximum length of $maxQueryLength characters"))

    if (blockedPatterns.exists(_.matcher(query).find()))
      return ValidationResult(valid = false, error = Some(
        "Query contains blocked keywords or patterns"))

    val stripped = query.trim
    allowedPatterns.collectFirst {
      // lookingAt = match anchored at start only (Python re.match)
      case (name, p, maxRows) if p.matcher(stripped).lookingAt() =>
        ValidationResult(valid = true, pattern = Some(name),
          maxRows = Some(maxRows))
    }.getOrElse(ValidationResult(valid = false, error = Some(
      "Query does not match any allowed pattern")))
  }
}

package graft.validate

/** Query sanitization, porting the reference semantics exactly
  * (shared/utils/validators.py:64-73): strip block comments, strip
  * line comments, collapse all whitespace runs to single spaces.
  */
object QuerySanitizer {
  private val BlockComment = "(?s)/\\*.*?\\*/".r
  private val LineComment = "(?m)--.*?$".r

  def sanitize(query: String): String = {
    val noBlock = BlockComment.replaceAllIn(query, "")
    val noLine = LineComment.replaceAllIn(noBlock, "")
    noLine.split("\\s+").filter(_.nonEmpty).mkString(" ").trim
  }
}

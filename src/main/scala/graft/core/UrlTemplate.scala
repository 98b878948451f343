package graft.core

/**
 * Template URL/query rendering (SURVEY §2.7 F14): the reference's
 * `{{var|filter}}` placeholder substitution (`apps/api/src/utils/
 * urlTemplate.ts:1-103`) as a pure, total Scala function.
 *
 * Filters:
 *   raw    — value verbatim (default when no filter given)
 *   query  — URL query-component encoding (space -> '+', reserved escaped)
 *   path   — URL path-segment encoding (space -> %20, '/' escaped)
 *   host   — lowercased, non-hostname chars stripped
 *
 * Unknown variables render as empty string; unknown filters fall back to raw
 * (the reference's lenient behavior). Driver-side config concern — no Spark
 * types here.
 */
object UrlTemplate {

  private val Placeholder = """\{\{\s*([A-Za-z0-9_.-]+)\s*(?:\|\s*([A-Za-z]+)\s*)?\}\}""".r

  def render(template: String, vars: Map[String, String]): String =
    Placeholder.replaceAllIn(template, m => {
      val value = vars.getOrElse(m.group(1), "")
      val filtered = Option(m.group(2)).map(_.toLowerCase) match {
        case Some("query") => encodeQuery(value)
        case Some("path")  => encodePath(value)
        case Some("host")  => value.toLowerCase.filter(c =>
          c.isLetterOrDigit || c == '.' || c == '-')
        case _             => value // raw / unknown filter
      }
      java.util.regex.Matcher.quoteReplacement(filtered)
    })

  def encodeQuery(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  def encodePath(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20")
      .replace("%2F", "%2F") // '/' stays escaped inside a segment
}

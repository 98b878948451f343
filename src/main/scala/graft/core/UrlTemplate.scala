package graft.core

/**
 * Template URL/query rendering (SURVEY §2.7 F14): the reference's
 * `{{var|filter}}` placeholder substitution (`apps/api/src/utils/
 * urlTemplate.ts:1-103`) as a pure, total Scala function.
 *
 * Faithful semantics (each was an audited divergence in round 1):
 *  - `\{{` escapes a literal `{{` (protected before matching, restored after);
 *  - the placeholder regex only admits the four known filters
 *    (`raw|query|path|host`) — an unknown filter means NO match, so the
 *    placeholder stays verbatim in the output;
 *  - a MISSING variable keeps the original placeholder verbatim
 *    (urlTemplate.ts:70-73);
 *  - `query` uses encodeURIComponent semantics (space -> %20, unreserved
 *    set A-Za-z0-9 -_.!~*'());
 *  - `path` is encodeURIComponent with '/' restored (urlTemplate.ts:38);
 *  - `host` lower-cases and keeps only ASCII [a-z0-9.-].
 *
 * Variable names may be dotted paths (`a.b.c`) — callers flatten their
 * variable objects into dotted keys. [[renderText]] is the
 * `renderTextTemplate` variant where filters are inert (treated as raw).
 * Driver-side config concern — no Spark types here.
 */
object UrlTemplate {

  private val Esc = "AC_ESCAPED_LEFT"
  private val Placeholder =
    """\{\{\s*([A-Za-z0-9_.]+)(?:\s*\|\s*(raw|query|path|host))?\s*\}\}""".r

  /** URL-field rendering: filters active (renderUrlTemplate). */
  def render(template: String, vars: Map[String, String]): String =
    renderInternal(template, vars, allowFilters = true)

  /** Plain-text rendering: filters inert (renderTextTemplate). */
  def renderText(template: String, vars: Map[String, String]): String =
    renderInternal(template, vars, allowFilters = false)

  private def renderInternal(template: String, vars: Map[String, String],
      allowFilters: Boolean): String = {
    if (template == null || template.isEmpty) return template
    val guarded = template.replace("\\{{", Esc)
    val out = Placeholder.replaceAllIn(guarded, m => {
      val rep = vars.get(m.group(1)) match {
        case None => m.matched // missing variable: keep the placeholder
        case Some(v) =>
          val f = if (allowFilters) Option(m.group(2)).getOrElse("raw") else "raw"
          f match {
            case "query" => encodeURIComponent(v)
            case "path"  => encodeURIComponent(v).replaceAll("(?i)%2F", "/")
            case "host"  => v.toLowerCase.filter(c =>
              (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.' || c == '-')
            case _       => v
          }
      }
      java.util.regex.Matcher.quoteReplacement(rep)
    })
    out.replace(Esc, "{{")
  }

  /** JS `encodeURIComponent` equivalent: percent-encodes the UTF-8 bytes of
    * everything outside A-Za-z0-9 and `-_.!~*'()`, uppercase hex, space as
    * %20 (NOT '+'). */
  def encodeURIComponent(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val keep = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' ||
        c == '!' || c == '~' || c == '*' || c == '\'' || c == '(' || c == ')'
      if (keep) { sb.append(c); i += 1 }
      else {
        val cp = s.codePointAt(i)
        new String(Character.toChars(cp)).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xff}%02X"))
        i += Character.charCount(cp)
      }
    }
    sb.toString
  }
}

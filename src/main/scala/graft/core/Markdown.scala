package graft.core

/**
 * HTML -> Markdown serializer reproducing the reference's converter
 * (`packages/libs/src/html-to-markdown.ts:3-213`): turndown v7 defaults
 * (public knowledge — setext h1/h2, `* * *` hr, `*   ` bullets, indented
 * code blocks, inlined links, flanking-whitespace handling, join with
 * max-2-newline collapsing, markdown escaping) overridden by the reference's
 * nine custom rules:
 *
 *  1. remove script/style/noscript/meta/link        (:15-21)
 *  2. paragraphs: tight `\n\n` wrap, inline inside <a> (:24-41)
 *  3. divs: inline unless they contain block content  (:44-70)
 *  4. spans: sibling-aware spacing                    (:73-103)
 *  5. anchor-wrapping-a-single-image                  (:106-127)
 *  6. figure/picture tight wrappers                   (:130-137)
 *  7. figcaption as its own paragraph                 (:140-147)
 *  8. em/i -> `*`, strong/b -> `**` (trimmed)         (:150-167)
 *  9. <br> -> `\n`                                    (:170-175)
 *
 * plus its pre-processing (collapse inter-tag + all whitespace, :5-8) and
 * post-processing (bracket-wrapped-image normalization, link-text whitespace
 * collapse, 3+-newline collapse, trim, :178-209).
 */
object Markdown {

  private val blockElements: Set[String] = Set(
    "address", "article", "aside", "audio", "blockquote", "body", "canvas",
    "center", "dd", "dir", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "frameset", "h1", "h2", "h3", "h4", "h5",
    "h6", "header", "hgroup", "hr", "html", "isindex", "li", "main", "menu",
    "nav", "noframes", "noscript", "ol", "output", "p", "pre", "section",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul")

  private val removed: Set[String] = Set("script", "style", "noscript", "meta", "link")

  private val meaningfulWhenBlank: Set[String] = Set(
    "a", "table", "thead", "tbody", "tfoot", "th", "td", "iframe",
    "script", "audio", "video")

  def isBlock(tag: String): Boolean = blockElements.contains(tag)

  /** Full pipeline: preprocess raw HTML string, convert, postprocess. */
  def fromHtml(html: String): String = {
    val pre = html
      .replaceAll(">\\s+<", "><")
      .replaceAll("\\s+", " ")
      .trim
    val doc = Html.parse(pre)
    val body = convert(doc)
    postprocess(body)
  }

  // ------------------------------------------------------------ conversion

  private def convert(root: Html.Elem): String = {
    val out = processChildren(root, Nil)
    out
  }

  /** turndown `process`: reduce children joining with newline collapsing.
    * Accumulates into a StringBuilder — the naive fold
    * (`reverse.dropWhile.reverse` per child) is quadratic in document size. */
  private def processChildren(e: Html.Elem, ancestors: List[Html.Elem]): String = {
    val sb = new StringBuilder
    e.children.foreach { child =>
      val piece = child match {
        case Html.Text(t) =>
          if (ancestors.exists(a => a.tag == "pre" || a.tag == "code")) t else escapeMd(t)
        case el: Html.Elem => replacementFor(el, ancestors)
        case _ => ""
      }
      joinInto(sb, piece)
    }
    sb.toString
  }

  /** join(a, b): strip a's trailing + b's leading newlines, reinsert
    * min(2, max(stripped-from-a, stripped-from-b)). */
  private def joinInto(sb: StringBuilder, b: String): Unit = {
    var trail = 0
    while (trail < sb.length && sb.charAt(sb.length - 1 - trail) == '\n') trail += 1
    var lead = 0
    while (lead < b.length && b.charAt(lead) == '\n') lead += 1
    sb.setLength(sb.length - trail)
    val nls = math.min(2, math.max(trail, lead))
    var i = 0
    while (i < nls) { sb.append('\n'); i += 1 }
    if (lead == 0) sb.append(b) else sb.append(b.substring(lead))
  }

  /** turndown `replacementForNode` incl. flanking whitespace for inline nodes. */
  private def replacementFor(node: Html.Elem, ancestors: List[Html.Elem]): String = {
    if (removed.contains(node.tag)) return ""
    val content = processChildren(node, node :: ancestors)
    if (isBlock(node.tag)) {
      applyRule(node, content, ancestors)
    } else {
      val leading = if (content.nonEmpty && content.head.isWhitespace) " " else ""
      val trailing = if (content.nonEmpty && content.last.isWhitespace) " " else ""
      val trimmed = content.trim
      leading + applyRule(node, trimmed, ancestors) + trailing
    }
  }

  private def isBlank(node: Html.Elem): Boolean = {
    if (Html.voidElements.contains(node.tag) || meaningfulWhenBlank.contains(node.tag)) return false
    // early-exit subtree scan: any non-blank text or void/meaningful
    // descendant makes it non-blank (no subtree-text materialization)
    def scan(e: Html.Elem): Boolean = { // true => non-blank
      val it = e.children.iterator
      while (it.hasNext) it.next() match {
        case Html.Text(t) => if (hasNonWs(t)) return true
        case el: Html.Elem =>
          if (Html.voidElements.contains(el.tag) || meaningfulWhenBlank.contains(el.tag)) return true
          if (scan(el)) return true
        case _ =>
      }
      false
    }
    !scan(node)
  }

  private def hasNonWs(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!Character.isWhitespace(s.charAt(i))) return true; i += 1 }
    false
  }

  private def applyRule(node: Html.Elem, content: String, ancestors: List[Html.Elem]): String = {
    val tag = node.tag
    def insideAnchor: Boolean = ancestors.exists(_.tag == "a")

    // turndown blank rule fires before everything else
    if (isBlank(node) && !Set("br", "hr", "img").contains(tag) && tag != "p" && tag != "div" &&
        tag != "span" && tag != "figure" && tag != "picture" && tag != "figcaption")
      return if (isBlock(tag)) "\n\n" else ""

    tag match {
      case "p" => // custom rule :24-41
        val t = content.trim
        if (t.isEmpty) "" else if (insideAnchor) t else "\n\n" + t + "\n\n"

      case "div" => // custom rule :44-70
        val t = content.trim
        if (t.isEmpty) ""
        else if (insideAnchor) t
        else {
          val hasBlockContent = Html.select(node,
            "p, h1, h2, h3, h4, h5, h6, ul, ol, blockquote, pre").nonEmpty
          if (hasBlockContent) "\n\n" + t + "\n\n" else t + " "
        }

      case "span" => // custom rule :73-103 — sibling-aware spacing
        val t = content.trim
        if (t.isEmpty) ""
        else {
          val parentOpt = ancestors.headOption
          val (prev, next) = siblingsOf(parentOpt, node)
          def textual(n: Option[Html.Node]): Boolean = n match {
            case Some(Html.Text(s)) => s.trim.nonEmpty
            case Some(e: Html.Elem) if e.tag == "span" => e.text.trim.nonEmpty
            case _ => false
          }
          def anyContent(n: Option[Html.Node]): Boolean = n match {
            case Some(Html.Text(s)) => s.trim.nonEmpty
            case Some(e: Html.Elem) => e.text.trim.nonEmpty || Html.voidElements.contains(e.tag)
            case _ => false
          }
          val prefix = if (textual(prev)) " " else ""
          val suffix = if (anyContent(next)) " " else ""
          prefix + t + suffix
        }

      case "a" => // linkedImages custom rule :106-127, else turndown inlined link
        val nonWsChildren = node.children.filter {
          case Html.Text(t) => t.trim.nonEmpty
          case _ => true
        }
        val singleImg = nonWsChildren.size == 1 && (nonWsChildren.head match {
          case e: Html.Elem => e.tag == "img"
          case _ => false
        })
        if (singleImg) {
          val href = node.attr("href").getOrElse("").trim
          val invalid = href.isEmpty || href == "#" || href.toLowerCase.startsWith("javascript:")
          val imageMd = content.trim
          if (invalid) imageMd else s"[$imageMd]($href)"
        } else {
          val href = node.attr("href").getOrElse("")
          val title = node.attr("title").map(t => s""" "$t"""").getOrElse("")
          if (href.isEmpty) content else s"[$content]($href$title)"
        }

      case "figure" | "picture" => // :130-137
        val t = content.trim
        if (t.isEmpty) "" else s"\n\n$t\n\n"

      case "figcaption" => // :140-147
        val t = content.trim
        if (t.isEmpty) "" else s"\n\n$t\n\n"

      case "em" | "i" => // :150-167
        val t = content.trim
        if (t.isEmpty) "" else s"*$t*"

      case "strong" | "b" =>
        val t = content.trim
        if (t.isEmpty) "" else s"**$t**"

      case "br" => "\n" // :170-175

      case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
        val level = tag.charAt(1) - '0'
        if (level <= 2) {
          val underline = (if (level == 1) "=" else "-") * content.length
          s"\n\n$content\n$underline\n\n"
        } else {
          s"\n\n${"#" * level} $content\n\n"
        }

      case "blockquote" =>
        val t = content.replaceAll("^\\n+", "").replaceAll("\\n+$", "")
          .linesWithSeparators.map(l => "> " + l).mkString
        s"\n\n$t\n\n"

      case "ul" | "ol" =>
        val parentIsLi = ancestors.headOption.exists(_.tag == "li")
        val isLastChild = ancestors.headOption.exists { p =>
          p.children.lastIndexWhere { case e: Html.Elem => true; case Html.Text(t) => t.trim.nonEmpty; case _ => false } match {
            case -1 => false
            case i  => p.children(i) eq node
          }
        }
        if (parentIsLi && isLastChild) "\n" + content
        else "\n\n" + content + "\n\n"

      case "li" =>
        val parent = ancestors.headOption
        val body = content
          .replaceAll("^\\n+", "")
          .replaceAll("\\n+$", "\n")
          .replace("\n", "\n    ")
        val prefix = parent match {
          case Some(p) if p.tag == "ol" =>
            val start = p.attr("start").flatMap(s => scala.util.Try(s.toInt).toOption)
            val index = p.elementChildren.indexWhere(_ eq node)
            val num = start.map(_ + index).getOrElse(index + 1)
            s"$num.  "
          case _ => "*   "
        }
        val needsNl = parent.exists { p =>
          val els = p.elementChildren
          val i = els.indexWhere(_ eq node)
          i >= 0 && i < els.length - 1
        } && !body.endsWith("\n")
        prefix + body + (if (needsNl) "\n" else "")

      case "pre" =>
        // indented code block (codeBlockStyle: "indented"); content of the
        // inner <code> (or raw text) indented 4 spaces
        val raw = node.text
        if (raw.trim.isEmpty) "" else "\n\n    " + raw.replace("\n", "\n    ") + "\n\n"

      case "code" =>
        if (ancestors.headOption.exists(_.tag == "pre")) content
        else if (content.isEmpty) ""
        else {
          val delim = if (content.contains("`")) "``" else "`"
          val pad = if (content.startsWith("`") || content.endsWith("`")) " " else ""
          s"$delim$pad$content$pad$delim"
        }

      case "hr" => "\n\n* * *\n\n"

      case "img" =>
        val src = node.attr("src").getOrElse("")
        val alt = node.attr("alt").getOrElse("")
        val title = node.attr("title").map(t => s""" "$t"""").getOrElse("")
        if (src.isEmpty) "" else s"![$alt]($src$title)"

      case _ =>
        if (isBlock(tag)) {
          val t = content.trim
          if (t.isEmpty) "" else s"\n\n$t\n\n"
        } else content
    }
  }

  private def siblingsOf(parent: Option[Html.Elem], node: Html.Elem): (Option[Html.Node], Option[Html.Node]) =
    parent match {
      case Some(p) =>
        val idx = p.children.indexWhere {
          case e: Html.Elem => e eq node
          case _ => false
        }
        val prev = if (idx > 0) Some(p.children(idx - 1)) else None
        val next = if (idx >= 0 && idx < p.children.length - 1) Some(p.children(idx + 1)) else None
        (prev, next)
      case None => (None, None)
    }

  // -------------------------------------------------------------- escaping

  /** turndown default escapes. The guard scan skips the 13 regex passes for
    * plain prose (the overwhelmingly common case). */
  def escapeMd(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      // every char that any escape rule below can trigger on
      needs = c == '\\' || c == '*' || c == '-' || c == '+' || c == '=' ||
        c == '#' || c == '`' || c == '~' || c == '[' || c == ']' ||
        c == '>' || c == '_' ||
        (c == '.' && i > 0 && Character.isDigit(s.charAt(i - 1)))
      i += 1
    }
    if (!needs) return s
    var t = s
    t = t.replace("\\", "\\\\")
    t = t.replace("*", "\\*")
    t = t.replaceAll("(?m)^-", "\\\\-")
    t = t.replaceAll("(?m)^\\+ ", "\\\\+ ")
    t = t.replaceAll("(?m)^(=+)", "\\\\$1")
    t = t.replaceAll("(?m)^(#{1,6}) ", "\\\\$1 ")
    t = t.replace("`", "\\`")
    t = t.replaceAll("(?m)^~~~", "\\\\~~~")
    t = t.replace("[", "\\[")
    t = t.replace("]", "\\]")
    t = t.replaceAll("(?m)^>", "\\\\>")
    t = t.replace("_", "\\_")
    t = t.replaceAll("(?m)^(\\d+)\\. ", "$1\\\\. ")
    t
  }

  // ---------------------------------------------------------- post-process

  private val collapseInsideRe = """\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\]""".r
  private val stripBareRe = """\[\s*(!\[[^\]]*\]\([^\)]+\))\s*\](?!\s*[\(\[])""".r
  private val linkTextRe = """\[\s*([\s\S]*?)\s*\]\(([^\)]+)\)""".r

  def postprocess(md: String): String = {
    var out = md
    // normalizeBracketWrappedImages (:178-201)
    var prev: String = null
    do {
      prev = out
      out = collapseInsideRe.replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(s"[${m.group(1)}]"))
      out = stripBareRe.replaceAllIn(out, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    } while (out != prev)
    // normalizeLinkTextWhitespace (:204-209)
    out = linkTextRe.replaceAllIn(out, m => {
      val cleaned = m.group(1).replaceAll("[\\t\\r\\n]+", " ").replaceAll(" {2,}", " ").trim
      java.util.regex.Matcher.quoteReplacement(s"[$cleaned](${m.group(2)})")
    })
    out.replaceAll("\\n{3,}", "\n\n").trim
  }
}

package graft.core

/**
 * HTML -> Markdown serializer reproducing the reference's converter
 * (`packages/libs/src/html-to-markdown.ts:3-213`): turndown v7 defaults
 * (public knowledge — setext h1/h2, `* * *` hr, `*   ` bullets, indented
 * code blocks, inlined links, flanking-whitespace handling, collapse-
 * whitespace DOM pass, blank-rule precedence, join with max-2-newline
 * collapsing, markdown escaping) overridden by the reference's nine custom
 * rules:
 *
 *  1. remove script/style/noscript/meta/link        (:15-21)
 *  2. paragraphs: tight `\n\n` wrap, inline inside <a> (:24-41)
 *  3. divs: inline unless they contain block content  (:44-70)
 *  4. spans: sibling-aware spacing (text/span siblings only, :73-103)
 *  5. anchor-wrapping-a-single-image                  (:106-127)
 *  6. figure/picture tight wrappers                   (:130-137)
 *  7. figcaption as its own paragraph                 (:140-147)
 *  8. em/i -> `*`, strong/b -> `**` (trimmed)         (:150-167)
 *  9. <br> -> `\n`                                    (:170-175)
 *
 * plus its pre-processing (collapse inter-tag + all whitespace, :5-8, using
 * JS `\s` semantics — includes U+00A0) and post-processing (bracket-wrapped-
 * image normalization, link-text whitespace collapse, 3+-newline collapse,
 * trim, :178-209).
 *
 * Fidelity notes (turndown v7 semantics, audited for the golden corpus):
 *  - the blank rule fires before every other rule (Rules.forNode): a blank
 *    block element yields "\n\n", a blank inline element "" — even when a
 *    custom rule matches the tag;
 *  - collapse-whitespace runs over the DOM before conversion (RootNode);
 *  - flanking whitespace of inline elements consults siblings
 *    (isFlankedByWhitespace) and distinguishes ASCII from non-ASCII
 *    whitespace (U+00A0 survives);
 *  - the indented-code-block rule fires only when `pre`'s first child is
 *    `code` (otherwise `pre` takes the default block rule);
 *  - inline-link hrefs get `(` `)` escaped, titles are cleaned and `"`-escaped;
 *  - text is escaped unless inside `code` (not `pre`).
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

  /** JS `\s` character class (regex source form) — unlike Java's `\s` it
    * includes U+00A0 and the Unicode space separators. */
  private val JsWs =
    "\\t\\n\\x0B\\f\\r \\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"

  /** Collapse space/CR/LF/tab runs to one space without regex when the
    * input is already collapsed (the common case after the string pre-pass). */
  private def collapseRuns(t: String): String = {
    var i = 0
    var needs = false
    while (i < t.length && !needs) {
      val c = t.charAt(i)
      if (c == '\r' || c == '\n' || c == '\t') needs = true
      else if (c == ' ' && i + 1 < t.length) {
        val d = t.charAt(i + 1)
        if (d == ' ' || d == '\r' || d == '\n' || d == '\t') needs = true
      }
      i += 1
    }
    if (!needs) return t
    val sb = new StringBuilder(t.length)
    var inRun = false
    i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (c == ' ' || c == '\r' || c == '\n' || c == '\t') {
        if (!inRun) sb.append(' ')
        inRun = true
      } else { sb.append(c); inRun = false }
      i += 1
    }
    sb.toString
  }

  /** First character of the subtree's textContent, early-exit (no
    * materialization); NUL when the subtree has no text. */
  private def firstTextChar(e: Html.Elem): Char = {
    val it = e.children.iterator
    while (it.hasNext) it.next() match {
      case Html.Text(t) => if (t.nonEmpty) return t.charAt(0)
      case el: Html.Elem =>
        val c = firstTextChar(el)
        if (c != '\u0000') return c
      case _ =>
    }
    '\u0000'
  }

  private def lastTextChar(e: Html.Elem): Char = {
    val it = e.children.reverseIterator
    while (it.hasNext) it.next() match {
      case Html.Text(t) => if (t.nonEmpty) return t.charAt(t.length - 1)
      case el: Html.Elem =>
        val c = lastTextChar(el)
        if (c != '\u0000') return c
      case _ =>
    }
    '\u0000'
  }

  /** Early-exit equivalent of `e.text.trim.nonEmpty` (Scala trim: any char
    * above U+0020 counts as visible). */
  private def hasVisibleText(e: Html.Elem): Boolean = {
    val it = e.children.iterator
    while (it.hasNext) it.next() match {
      case Html.Text(t) =>
        var i = 0
        while (i < t.length) { if (t.charAt(i) > ' ') return true; i += 1 }
      case el: Html.Elem => if (hasVisibleText(el)) return true
      case _ =>
    }
    false
  }

  private def isJsWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r' ||
    c == '\u00a0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200a') ||
    c == '\u2028' || c == '\u2029' || c == '\u202f' || c == '\u205f' ||
    c == '\u3000' || c == '\ufeff'

  /** Full pipeline: preprocess raw HTML string (JS-\s semantics,
    * html-to-markdown.ts:5-8), parse, collapse whitespace, convert,
    * postprocess. */
  private val InterTagWsRe = java.util.regex.Pattern.compile(s">[$JsWs]+<")
  private val AnyWsRunRe = java.util.regex.Pattern.compile(s"[$JsWs]+")

  def fromHtml(html: String): String = {
    val pre = AnyWsRunRe.matcher(
        InterTagWsRe.matcher(html).replaceAll("><"))
      .replaceAll(" ")
      .trim
    val doc = Html.parse(pre)
    collapseWhitespace(doc)
    val body = processChildren(doc, Nil)
    postprocess(body)
  }

  /**
   * Convert an already-parsed (cleaned) DOM, skipping the serialize ->
   * string-preprocess -> re-parse roundtrip of [[fromHtml]] (~25% of kernel
   * time at 20 KB pages). [[domPreprocess]] applies the string pre-pass's
   * exact effect directly on the tree, so the output is byte-identical —
   * verified by the golden corpus, whose cases flow through this path.
   * (Sole knowing exception: the string form also collapses whitespace
   * inside an attribute value that itself contains `"> <"`, corrupting the
   * attribute — a reference quirk this path does not reproduce.)
   * MUTATES the given DOM; pass a copy if the caller still needs it.
   */
  def fromCleanedDoc(doc: Html.Elem): String = {
    domPreprocess(doc)
    collapseWhitespace(doc)
    postprocess(processChildren(doc, Nil))
  }

  /** The DOM equivalent of the reference's string pre-pass
    * (`>\s+<` removal + JS-`\s+` -> " " + trim) on SERIALIZED html:
    *  - whitespace-only text nodes between tags disappear;
    *  - whitespace runs collapse to one space in text AND attribute values —
    *    except U+00A0, which the serializer protects as `&nbsp;`;
    *  - doc-edge whitespace is trimmed. */
  private def domPreprocess(root: Html.Elem): Unit = {
    def isCollapsibleWs(c: Char): Boolean = c != ' ' && isJsWs(c)
    def collapseJs(t: String): String = {
      var i = 0
      var needs = false
      while (i < t.length && !needs) {
        val c = t.charAt(i)
        if (isCollapsibleWs(c) && (c != ' ' ||
            (i + 1 < t.length && isCollapsibleWs(t.charAt(i + 1))))) needs = true
        i += 1
      }
      if (!needs) return t
      val sb = new StringBuilder(t.length)
      var inRun = false
      i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (isCollapsibleWs(c)) {
          if (!inRun) sb.append(' ')
          inRun = true
        } else { sb.append(c); inRun = false }
        i += 1
      }
      sb.toString
    }
    def wsOnly(t: String): Boolean = {
      var i = 0
      while (i < t.length) { if (!isCollapsibleWs(t.charAt(i))) return false; i += 1 }
      t.nonEmpty
    }
    def go(e: Html.Elem): Unit = {
      // 1. coalesce adjacent text nodes: in the serialized form they are one
      //    maximal text run (element removal by the Cleaner is what creates
      //    adjacency), and run boundaries decide both the `>\s+<` removal
      //    and `^`-anchored markdown escapes downstream
      val merged = scala.collection.mutable.ArrayBuffer[Html.Node]()
      e.children.foreach {
        case t: Html.Text =>
          merged.lastOption match {
            case Some(p: Html.Text) => p.text = p.text + t.text
            case _ => merged += t
          }
        case other => merged += other
      }
      // 2. whitespace-only runs sit between tags in the serialized form ->
      //    removed; everything else collapses
      merged.filterInPlace { case Html.Text(t) => !wsOnly(t); case _ => true }
      merged.foreach {
        case t: Html.Text => t.text = collapseJs(t.text)
        case el: Html.Elem =>
          if (el.attrs.nonEmpty)
            el.attrs = el.attrs.map { case (k, v) => (k, collapseJs(v)) }
          go(el)
        case _ =>
      }
      e.children = merged
    }
    go(root)
    // doc-edge trim (the string pre-pass's .trim)
    root.children.headOption match {
      case Some(t: Html.Text) if t.text.startsWith(" ") => t.text = t.text.substring(1)
      case _ =>
    }
    root.children.lastOption match {
      case Some(t: Html.Text) if t.text.endsWith(" ") =>
        t.text = t.text.substring(0, t.text.length - 1)
      case _ =>
    }
    root.children.filterInPlace { case Html.Text(t) => t.nonEmpty; case _ => true }
  }

  // --------------------------------------------------- collapse-whitespace
  //
  // turndown's RootNode pre-pass (the `collapse-whitespace` algorithm):
  // pre-order walk; text runs of [ \r\n\t] collapse to one space; leading
  // space is dropped at block starts / after trailing-space text; trailing
  // space is dropped before blocks, <br>, and at the end. <pre> subtrees and
  // void elements are skipped (and keep the following text's leading space).

  private def collapseWhitespace(root: Html.Elem): Unit = {
    var prevText: Html.Text = null
    var prevTextParent: Html.Elem = null
    var keepLeadingWs = false
    val empties = scala.collection.mutable.ArrayBuffer[(Html.Elem, Html.Node)]()

    def visit(e: Html.Elem): Unit = {
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case t: Html.Text =>
            var s = collapseRuns(t.text)
            if ((prevText == null || prevText.text.endsWith(" ")) &&
                !keepLeadingWs && s.startsWith(" "))
              s = s.substring(1)
            if (s.isEmpty) empties += ((e, t))
            else { t.text = s; prevText = t; prevTextParent = e }
          case el: Html.Elem =>
            val tag = el.tag
            if (isBlock(tag) || tag == "br") {
              if (prevText != null && prevText.text.endsWith(" "))
                prevText.text = prevText.text.substring(0, prevText.text.length - 1)
              prevText = null
              keepLeadingWs = false
              visit(el)
            } else if (Html.voidElements.contains(tag) || tag == "pre" ||
                       tag == "script" || tag == "style" || tag == "textarea") {
              prevText = null
              keepLeadingWs = true
              // pre/rawtext subtrees keep their whitespace; voids are empty
            } else {
              if (prevText != null) keepLeadingWs = false
              visit(el)
            }
          case _ => // comments/doctypes are invisible to the converter
        }
        i += 1
      }
    }
    visit(root)
    if (prevText != null) {
      if (prevText.text.endsWith(" "))
        prevText.text = prevText.text.substring(0, prevText.text.length - 1)
      if (prevText.text.isEmpty) empties += ((prevTextParent, prevText))
    }
    empties.foreach { case (parent, node) =>
      val idx = parent.children.indexWhere(_ eq node)
      if (idx >= 0) parent.children.remove(idx)
    }
  }

  // ------------------------------------------------------------ conversion

  /** turndown `process`: reduce children joining with newline collapsing.
    * Accumulates into a StringBuilder — the naive fold
    * (`reverse.dropWhile.reverse` per child) is quadratic in document size. */
  private def processChildren(e: Html.Elem, ancestors: List[Html.Elem]): String = {
    val sb = new StringBuilder
    e.children.foreach { child =>
      val piece = child match {
        case Html.Text(t) =>
          // turndown escapes text nodes unless node.isCode (CODE ancestry only)
          if (ancestors.exists(_.tag == "code")) t else escapeMd(t)
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

  /** turndown `replacementForNode`: blank rule first, then flanking
    * whitespace for inline nodes, then the matched rule. */
  private def replacementFor(node: Html.Elem, ancestors: List[Html.Elem]): String = {
    if (removed.contains(node.tag)) return ""
    val blank = isBlank(node)
    val content = processChildren(node, node :: ancestors)
    if (isBlock(node.tag)) {
      if (blank) "\n\n" else applyRule(node, content, ancestors)
    } else {
      val (leading, trailing) = flanking(node, ancestors)
      val c2 = if (leading.nonEmpty || trailing.nonEmpty) content.trim else content
      val body = if (blank) "" else applyRule(node, c2, ancestors)
      leading + body + trailing
    }
  }

  // turndown edgeWhitespace: ascii ([ \t\r\n]) vs non-ascii (JS-\s rest) edges
  private val EdgeWsRe =
    (s"^(([ \\t\\r\\n]*)([$JsWs]*))(?:(?=\\S)[\\s\\S]*\\S)?(([$JsWs]*?)([ \\t\\r\\n]*))$$").r

  /** turndown flankingWhitespace: edge whitespace of the node's textContent;
    * ASCII edges are abolished when the adjacent sibling already supplies
    * whitespace (isFlankedByWhitespace). Block nodes have no flanking. */
  private def flanking(node: Html.Elem, ancestors: List[Html.Elem]): (String, String) = {
    // fast path: both textContent edges are non-whitespace (the overwhelming
    // majority of inline elements) -> no flanking, no subtree materialization
    val fc = firstTextChar(node)
    if (fc != '\u0000' && !isJsWs(fc)) {
      val lc = lastTextChar(node)
      if (lc != '\u0000' && !isJsWs(lc)) return ("", "")
    }
    val txt = node.text
    EdgeWsRe.findFirstMatchIn(txt) match {
      case Some(m) =>
        val leadingAll = Option(m.group(1)).getOrElse("")
        val leadingAscii = Option(m.group(2)).getOrElse("")
        val leadingNonAscii = Option(m.group(3)).getOrElse("")
        val trailingAll = Option(m.group(4)).getOrElse("")
        val trailingNonAscii = Option(m.group(5)).getOrElse("")
        val trailingAscii = Option(m.group(6)).getOrElse("")
        val (prev, next) = siblingsOf(ancestors.headOption, node)
        val leading =
          if (leadingAscii.nonEmpty && flankedByWs(prev, left = true)) leadingNonAscii
          else leadingAll
        val trailing =
          if (trailingAscii.nonEmpty && flankedByWs(next, left = false)) trailingNonAscii
          else trailingAll
        (leading, trailing)
      case None => ("", "")
    }
  }

  private def flankedByWs(sibling: Option[Html.Node], left: Boolean): Boolean =
    sibling match {
      case Some(Html.Text(t)) =>
        if (left) t.endsWith(" ") else t.startsWith(" ")
      case Some(e: Html.Elem) if !isBlock(e.tag) =>
        val c = if (left) lastTextChar(e) else firstTextChar(e)
        c == ' '.toInt
      case _ => false
    }

  /** turndown isBlank: not void, not meaningful-when-blank, whitespace-only
    * textContent (JS \s), and no void/meaningful descendants. */
  private def isBlank(node: Html.Elem): Boolean = {
    if (Html.voidElements.contains(node.tag) || meaningfulWhenBlank.contains(node.tag)) return false
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
    while (i < s.length) { if (!isJsWs(s.charAt(i))) return true; i += 1 }
    false
  }

  /** turndown cleanAttribute: collapse newline runs. */
  private def cleanAttribute(s: String): String =
    s.replaceAll("(\\n+\\s*)+", "\n")

  private def applyRule(node: Html.Elem, content: String, ancestors: List[Html.Elem]): String = {
    val tag = node.tag
    def insideAnchor: Boolean = ancestors.exists(_.tag == "a")

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

      case "span" => // custom rule :73-103 — sibling-aware spacing.
        // Both prefix and suffix consider only text or SPAN siblings
        // (html-to-markdown.ts:85-99).
        val t = content.trim
        if (t.isEmpty) ""
        else {
          val (prev, next) = siblingsOf(ancestors.headOption, node)
          def textual(n: Option[Html.Node]): Boolean = n match {
            case Some(Html.Text(s)) => s.trim.nonEmpty
            case Some(e: Html.Elem) if e.tag == "span" => hasVisibleText(e)
            case _ => false
          }
          val prefix = if (textual(prev)) " " else ""
          val suffix = if (textual(next)) " " else ""
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
          val href0 = node.attr("href").getOrElse("")
          if (href0.isEmpty) content
          else {
            // turndown inlineLink: escape parens in href, clean + escape title
            val href = href0.replaceAll("([()])", "\\\\$1")
            val title = node.attr("title").map(cleanAttribute).filter(_.nonEmpty)
              .map(t => " \"" + t.replace("\"", "\\\"") + "\"").getOrElse("")
            s"[$content]($href$title)"
          }
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
        // turndown list rule: parent LI whose lastElementChild is this list
        val parentIsLi = ancestors.headOption.exists(_.tag == "li")
        val isLastElementChild = ancestors.headOption.exists(p =>
          p.elementChildren.lastOption.exists(_ eq node))
        if (parentIsLi && isLastElementChild) "\n" + content
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
        // turndown: node.nextSibling (any node type) && content not \n-terminated
        val needsNl = parent.exists { p =>
          val i = p.children.indexWhere { case e: Html.Elem => e eq node; case _ => false }
          i >= 0 && i < p.children.length - 1
        } && !body.endsWith("\n")
        prefix + body + (if (needsNl) "\n" else "")

      case "pre" =>
        // turndown indentedCodeBlock fires only when firstChild is <code>;
        // a bare <pre> takes the default block rule over its processed content.
        node.children.headOption match {
          case Some(code: Html.Elem) if code.tag == "code" =>
            val raw = code.text
            "\n\n    " + raw.replace("\n", "\n    ") + "\n\n"
          case _ =>
            "\n\n" + content + "\n\n"
        }

      case "code" =>
        // turndown: code that is the only child of a <pre> is the code block's
        // payload (handled by the pre rule; content passes through untouched).
        val soleChildOfPre = ancestors.headOption.exists(p =>
          p.tag == "pre" && p.children.length == 1)
        if (soleChildOfPre) content
        else if (content.isEmpty) ""
        else {
          val c = content.replaceAll("\\r?\\n|\\r", " ")
          val extraSpace =
            if (c.startsWith("`") || c.endsWith("`") ||
                (c.startsWith(" ") && c.endsWith(" ") && c.exists(_ != ' '))) " "
            else ""
          var delimiter = "`"
          val runs = "`+".r.findAllIn(c).toSet
          while (runs.contains(delimiter)) delimiter += "`"
          delimiter + extraSpace + c + extraSpace + delimiter
        }

      case "hr" => "\n\n* * *\n\n"

      case "img" =>
        val alt = node.attr("alt").map(cleanAttribute).getOrElse("")
        val src = node.attr("src").getOrElse("")
        val title = node.attr("title").map(cleanAttribute).filter(_.nonEmpty)
          .map(t => s""" "$t"""").getOrElse("")
        if (src.isEmpty) "" else s"![$alt]($src$title)"

      case _ =>
        // turndown defaultRule: no trimming
        if (isBlock(tag)) "\n\n" + content + "\n\n" else content
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

package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * Minimal hand-written HTML5-ish parser + DOM used by the extraction kernel.
 *
 * The reference delegates parsing to cheerio/parse5 (public knowledge); this
 * is a from-scratch Scala implementation of the subset the crawl corpus and
 * the extraction pipeline need: elements, attributes, text, comments,
 * doctype, raw-text elements (script/style), void elements, auto-closing
 * `<p>`/`<li>`, entity decoding, and lenient unclosed-tag recovery.
 *
 * Runs executor-side inside `mapPartitions` — no reflection, no globals,
 * allocation-lean (a single pass over the char array).
 */
object Html {

  sealed trait Node
  final case class Text(var text: String) extends Node
  final case class Comment(text: String) extends Node
  final case class Doctype(text: String) extends Node
  final class Elem(
      val tag: String,
      var attrs: Vector[(String, String)],
      var children: ArrayBuffer[Node]
  ) extends Node {
    def attr(name: String): Option[String] = attrs.find(_._1 == name).map(_._2)
    def setAttr(name: String, value: String): Unit = {
      val i = attrs.indexWhere(_._1 == name)
      attrs = if (i >= 0) attrs.updated(i, (name, value)) else attrs :+ ((name, value))
    }
    def classes: Set[String] =
      attr("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    def id: Option[String] = attr("id")
    /** Recursive concatenated text (like cheerio's `.text()`). */
    def text: String = {
      val sb = new StringBuilder
      def go(n: Node): Unit = n match {
        case Text(t) => sb.append(t)
        case e: Elem => e.children.foreach(go)
        case _ =>
      }
      children.foreach(go)
      sb.toString
    }
    def elementChildren: Seq[Elem] = children.collect { case e: Elem => e }.toSeq
    def deepCopy: Elem = {
      val c = new Elem(tag, attrs, ArrayBuffer.empty)
      children.foreach {
        case e: Elem => c.children += e.deepCopy
        // Text is MUTABLE (the markdown collapse/preprocess passes edit it
        // in place) — sharing instances across copies leaks those edits
        // into the raw DOM the text extractor reads
        case Text(t) => c.children += Text(t)
        case other   => c.children += other
      }
      c
    }
  }

  /** Root document: an Elem with pseudo-tag "#root". */
  type Doc = Elem

  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val rawTextElements: Set[String] = Set("script", "style", "textarea", "title")

  /** Elements that implicitly close an open <p>. */
  private val pClosers: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "table", "ul")

  // ---------------------------------------------------------------- entities

  private val namedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00a0", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "hellip" -> "…", "mdash" -> "—", "ndash" -> "–",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "middot" -> "·", "bull" -> "•", "sect" -> "§", "para" -> "¶",
    "dagger" -> "†", "deg" -> "°", "plusmn" -> "±", "micro" -> "µ",
    "frac12" -> "½", "frac14" -> "¼", "sup2" -> "²", "sup3" -> "³",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "szlig" -> "ß", "agrave" -> "à", "eacute" -> "é", "egrave" -> "è",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "ccedil" -> "ç",
    "ntilde" -> "ñ", "larr" -> "←", "rarr" -> "→", "uarr" -> "↑",
    "darr" -> "↓", "harr" -> "↔", "infin" -> "∞", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "shy" -> "­")

  /** Decode HTML entities (named subset + numeric). Unknown entities pass
    * through verbatim, as browsers do for unterminated/unknown refs. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))) catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1))))) catch { case _: Exception => None }
            else namedEntities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape for text-node serialization (parse5 semantics: U+00A0 is
    * serialized as &nbsp; — this is what lets a non-breaking space survive
    * the markdown pipeline's whitespace pre-collapse, as it does through
    * cheerio's $.html()). */
  def escapeText(s: String): String =
    s.replace("&", "&amp;").replace("\u00a0", "&nbsp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Escape for double-quoted attribute values (parse5: &, ", U+00A0). */
  def escapeAttr(s: String): String =
    s.replace("&", "&amp;").replace("\u00a0", "&nbsp;").replace("\"", "&quot;")

  // ----------------------------------------------------------------- parser

  def parse(html: String): Doc = {
    val root = new Elem("#root", Vector.empty, ArrayBuffer.empty)
    val stack = ArrayBuffer[Elem](root)
    def top = stack.last
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(until: Int): Unit = {
      if (until > textStart) {
        val raw = html.substring(textStart, until)
        top.children += Text(decodeEntities(raw))
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          if (html.startsWith("<!--", i)) {
            flushText(i)
            val end = html.indexOf("-->", i + 4)
            val stop = if (end < 0) n else end
            top.children += Comment(html.substring(i + 4, stop))
            i = if (end < 0) n else end + 3
            textStart = i
          } else {
            // doctype or other declaration
            flushText(i)
            val end = html.indexOf('>', i)
            val stop = if (end < 0) n else end
            top.children += Doctype(html.substring(i + 2, stop))
            i = if (end < 0) n else end + 1
            textStart = i
          }
        } else if (c1 == '/') {
          flushText(i)
          val end = html.indexOf('>', i)
          val stop = if (end < 0) n else end
          val tag = html.substring(i + 2, stop).trim.toLowerCase
          // Lenient close: pop to the matching open tag if present.
          val idx = stack.lastIndexWhere(_.tag == tag)
          if (idx > 0) stack.remove(idx + 1, stack.length - idx - 1) // unwind above match
          if (idx > 0) stack.remove(idx)
          i = if (end < 0) n else end + 1
          textStart = i
        } else if (c1.isLetter) {
          flushText(i)
          val (elem, selfClosed, nextI) = parseTag(html, i)
          // implied closes: a block start closes any open <p>; a new <li>
          // closes the current <li> of the *same* list (not an ancestor list).
          if (pClosers.contains(elem.tag)) {
            val pIdx = stack.lastIndexWhere(_.tag == "p")
            if (pIdx > 0) stack.remove(pIdx, stack.length - pIdx)
          }
          if (elem.tag == "li") {
            val liIdx = stack.lastIndexWhere(_.tag == "li")
            val listIdx = stack.lastIndexWhere(e => e.tag == "ul" || e.tag == "ol")
            if (liIdx > 0 && liIdx > listIdx) stack.remove(liIdx, stack.length - liIdx)
          }
          top.children += elem
          i = nextI
          if (!selfClosed && !voidElements.contains(elem.tag)) {
            if (rawTextElements.contains(elem.tag)) {
              // consume raw text until matching close tag
              val closeTag = "</" + elem.tag
              val lower = html
              var j = i
              var found = -1
              while (found < 0 && j < n) {
                val k = lower.indexOf('<', j)
                if (k < 0) { found = n }
                else if (k + closeTag.length <= n &&
                  lower.regionMatches(true, k, closeTag, 0, closeTag.length)) found = k
                else j = k + 1
              }
              val stop = if (found < 0) n else found
              val raw = html.substring(i, stop)
              if (raw.nonEmpty)
                elem.children += Text(if (elem.tag == "title" || elem.tag == "textarea") decodeEntities(raw) else raw)
              val gtEnd = html.indexOf('>', stop)
              i = if (found >= n || gtEnd < 0) n else gtEnd + 1
            } else {
              stack += elem
            }
          }
          textStart = i
        } else { i += 1 }
      } else { i += 1 }
    }
    flushText(n)
    root
  }

  /** Parse one start tag beginning at `html(start) == '<'`.
    * Returns (element, selfClosed, indexAfterTag). */
  private def parseTag(html: String, start: Int): (Elem, Boolean, Int) = {
    val n = html.length
    var i = start + 1
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-' || html.charAt(i) == ':')) i += 1
    val tag = html.substring(tagStart, i).toLowerCase
    val attrs = Vector.newBuilder[(String, String)]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClosed = true; i += 2; done = true }
          else i += 1
        case _ =>
          val nameStart = i
          while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val name = html.substring(nameStart, i).toLowerCase
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vStart = i
              while (i < n && html.charAt(i) != q) i += 1
              attrs += ((name, decodeEntities(html.substring(vStart, i))))
              if (i < n) i += 1
            } else {
              val vStart = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              attrs += ((name, decodeEntities(html.substring(vStart, i))))
            }
          } else if (name.nonEmpty) {
            attrs += ((name, ""))
          }
      }
    }
    (new Elem(tag, attrs.result(), ArrayBuffer.empty), selfClosed, i)
  }

  // ------------------------------------------------------------- serializer

  /** Serialize back to HTML (cheerio `$.html()`-style: double-quoted attrs,
    * `&<>` escaped in text, void elements bare). */
  def render(node: Node): String = {
    val sb = new StringBuilder
    renderInto(node, sb)
    sb.toString
  }

  def renderChildren(e: Elem): String = {
    val sb = new StringBuilder
    e.children.foreach(renderInto(_, sb))
    sb.toString
  }

  private def renderInto(node: Node, sb: StringBuilder): Unit = node match {
    case Text(t)    => sb.append(escapeText(t))
    case Comment(t) => sb.append("<!--").append(t).append("-->")
    case Doctype(t) => sb.append("<!").append(t).append(">")
    case e: Elem if e.tag == "#root" => e.children.foreach(renderInto(_, sb))
    case e: Elem =>
      sb.append('<').append(e.tag)
      e.attrs.foreach { case (k, v) =>
        sb.append(' ').append(k).append("=\"").append(escapeAttr(v)).append('"')
      }
      sb.append('>')
      if (!voidElements.contains(e.tag)) {
        if (e.tag == "script" || e.tag == "style")
          e.children.foreach { case Text(t) => sb.append(t); case o => renderInto(o, sb) }
        else e.children.foreach(renderInto(_, sb))
        sb.append("</").append(e.tag).append('>')
      }
  }

  // -------------------------------------------------------------- traversal

  def walk(root: Elem)(f: Elem => Unit): Unit = {
    f(root)
    root.children.foreach { case e: Elem => walk(e)(f); case _ => }
  }

  /** All elements in document order (excluding the #root pseudo-element). */
  def allElements(root: Elem): Seq[Elem] = {
    val out = ArrayBuffer[Elem]()
    walk(root)(e => if (e.tag != "#root") out += e)
    out.toSeq
  }

  /** Remove every element for which `pred` is true (children go with it). */
  def removeWhere(root: Elem)(pred: Elem => Boolean): Unit = {
    def go(e: Elem): Unit = {
      e.children.filterInPlace {
        case el: Elem => !pred(el)
        case _        => true
      }
      e.children.foreach { case el: Elem => go(el); case _ => }
    }
    go(root)
  }

  /** Remove all comment nodes (HTMLTransformer.ts:137-139). */
  def removeComments(root: Elem): Unit = {
    def go(e: Elem): Unit = {
      e.children.filterInPlace { case _: Comment => false; case _ => true }
      e.children.foreach { case el: Elem => go(el); case _ => }
    }
    go(root)
  }

  /** Whitespace-delimited token membership (class-attribute semantics)
    * without allocation. */
  def containsToken(s: String, token: String): Boolean = {
    if (token.isEmpty) return false
    var i = 0
    val n = s.length; val m = token.length
    while (i <= n - m) {
      if (s.startsWith(token, i) &&
          (i == 0 || Character.isWhitespace(s.charAt(i - 1))) &&
          (i + m == n || Character.isWhitespace(s.charAt(i + m)))) return true
      i += 1
    }
    false
  }

  /** First element matching selector, cheerio `$(sel).first()`. */
  def selectFirst(root: Elem, selector: String): Option[Elem] =
    Selector.select(root, selector).headOption

  def select(root: Elem, selector: String): Seq[Elem] = Selector.select(root, selector)
}

/**
 * CSS selector subset: comma groups; descendant (whitespace) and child (`>`)
 * combinators; simple selectors `tag`, `.class`, `#id`, `[attr]`,
 * `[attr="value"]`, `*`, and conjunctions thereof (`div.cls[a="b"]`).
 * Covers everything the reference uses: the 46-entry cleaning list
 * (HTMLTransformer.ts:21-66), `meta`/`title`, and the SERP selectors
 * `div[jscontroller="SC7lYd"]`, `a h3`, `div[data-sncf="1"]` (Google.ts:206-227).
 */
object Selector {
  final case class Simple(tag: Option[String], id: Option[String],
      classes: Seq[String], attrs: Seq[(String, Option[String])]) {
    def matches(e: Html.Elem): Boolean =
      tag.forall(t => t == "*" || e.tag == t) &&
      id.forall(i => e.id.contains(i)) &&
      (classes.isEmpty || {
        // hot path of the 46-selector cleaning sweep: token-scan the class
        // attribute instead of materializing a Set per (element, selector)
        e.attr("class") match {
          case Some(cls) => classes.forall(c => Html.containsToken(cls, c))
          case None      => false
        }
      }) &&
      attrs.forall { case (k, vOpt) =>
        e.attr(k) match {
          case Some(v) => vOpt.forall(_ == v)
          case None    => false
        }
      }
  }
  /** chain of (combinator, simple); combinator ' ' = descendant, '>' = child */
  final case class Chain(parts: Seq[(Char, Simple)])

  def parseSelector(sel: String): Seq[Chain] =
    sel.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(parseChain)

  private def parseChain(s: String): Chain = {
    val toks = tokenizeChain(s)
    Chain(toks)
  }

  private def tokenizeChain(s: String): Seq[(Char, Simple)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Char, Simple)]()
    var comb = ' '
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i < n && s.charAt(i) == '>') { comb = '>'; i += 1 }
      else if (i < n) {
        val start = i
        var depth = 0
        while (i < n && (depth > 0 || (!s.charAt(i).isWhitespace && s.charAt(i) != '>'))) {
          if (s.charAt(i) == '[') depth += 1
          if (s.charAt(i) == ']') depth -= 1
          i += 1
        }
        out += ((comb, parseSimple(s.substring(start, i))))
        comb = ' '
      }
    }
    out.toSeq
  }

  private def parseSimple(s: String): Simple = {
    var tag: Option[String] = None
    var id: Option[String] = None
    val classes = Seq.newBuilder[String]
    val attrs = Seq.newBuilder[(String, Option[String])]
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '.' =>
          val st = i + 1; i += 1
          while (i < n && s.charAt(i) != '.' && s.charAt(i) != '#' && s.charAt(i) != '[') i += 1
          classes += s.substring(st, i)
          i -= 1
        case '#' =>
          val st = i + 1; i += 1
          while (i < n && s.charAt(i) != '.' && s.charAt(i) != '#' && s.charAt(i) != '[') i += 1
          id = Some(s.substring(st, i))
          i -= 1
        case '[' =>
          val end = s.indexOf(']', i)
          val body = s.substring(i + 1, if (end < 0) n else end)
          val eq = body.indexOf('=')
          if (eq < 0) attrs += ((body.trim, None))
          else {
            val k = body.substring(0, eq).trim
            var v = body.substring(eq + 1).trim
            if (v.length >= 2 && (v.head == '"' || v.head == '\'')) v = v.substring(1, v.length - 1)
            attrs += ((k, Some(v)))
          }
          i = if (end < 0) n else end + 1
          i -= 1
        case _ =>
          val st = i
          while (i < n && s.charAt(i) != '.' && s.charAt(i) != '#' && s.charAt(i) != '[') i += 1
          val t = s.substring(st, i).toLowerCase
          if (t.nonEmpty) tag = Some(t)
          i -= 1
      }
      i += 1
    }
    Simple(tag, id, classes.result(), attrs.result())
  }

  /** All elements matching `selector`, in document order, de-duplicated. */
  def select(root: Html.Elem, selector: String): Seq[Html.Elem] = {
    val chains = parseSelector(selector)
    val out = scala.collection.mutable.LinkedHashSet[Html.Elem]()
    // walk with ancestor path
    def go(e: Html.Elem, path: List[Html.Elem]): Unit = {
      if (e.tag != "#root" && chains.exists(matchesChain(e, path, _))) out += e
      val newPath = if (e.tag == "#root") path else e :: path
      e.children.foreach { case el: Html.Elem => go(el, newPath); case _ => }
    }
    go(root, Nil)
    out.toSeq
  }

  private def matchesChain(e: Html.Elem, ancestors: List[Html.Elem], chain: Selector.Chain): Boolean = {
    val parts = chain.parts
    if (parts.isEmpty) return false
    if (!parts.last._2.matches(e)) return false
    // match remaining parts right-to-left against ancestor chain
    def fit(remaining: List[(Char, Simple)], anc: List[Html.Elem], childOnly: Boolean): Boolean =
      remaining match {
        case Nil => true
        case (comb, simple) :: rest =>
          anc match {
            case Nil => false
            case a :: tail =>
              if (simple.matches(a) && fit(rest, tail, comb == '>')) true
              else if (childOnly) false
              else fit(remaining, tail, false)
          }
      }
    val front = parts.init.reverse.toList // nearest-ancestor-first
    val lastComb = parts.last._1
    fit(front.map { case (c, s) => (c, s) }, ancestors, lastComb == '>')
  }
}

package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * HTML -> plain text, reproducing `convert(rawHtml)` with html-to-text v9
 * defaults (public knowledge), used at
 * `packages/scrape/src/core/DataExtractor.ts:276`:
 *
 *  - only `body` is processed (baseElements default)
 *  - 80-column greedy word wrap (words longer than the width overflow)
 *  - headings uppercased (hrefs inside them are not), 3 leading / 2 trailing
 *    line breaks
 *  - paragraphs 2/2 line breaks; div/article/aside/footer/form/header/main/
 *    nav blocks 1/1 — and tags absent from v9's default selector list
 *    (section, figure, figcaption, dl, address, ...) are INLINE
 *  - `a` -> `text [href]` (mailto: prefix stripped; `#...` hidden via
 *    noAnchorUrl; brackets kept even when href equals the text)
 *  - `img` -> `alt [src]`
 *  - `ul` -> ` * ` items, `ol` -> ` N. ` items; 1 line break between items,
 *    2 around the list (1 when nested)
 *  - `blockquote` -> `> ` prefix, 2/2
 *  - `pre` verbatim 2/2, `hr` -> 40 dashes 2/2
 *  - script/style/head noise dropped
 *
 * Known approximations (documented, excluded from the golden corpus):
 * deeply-nested list prefix alignment (v9 right-pads prefixes to the longest
 * in the list) and `table` (v9 renders aligned data-table columns; here rows
 * are lines with space-joined cells).
 *
 * This function defines the `text` column contract of the pages corpus
 * (BASELINE.json input_hint: byte-identical extracted text per url).
 */
object TextExtract {

  private val wrapWidth = 80
  private val skip: Set[String] = Set("script", "style", "noscript", "template", "head", "title", "meta", "link", "base")

  /** v9 default block-format tags with leading/trailing 1 line break. */
  private val softBlocks: Set[String] = Set(
    "article", "aside", "div", "footer", "form", "header", "main", "nav")

  def fromHtml(html: String): String = fromDoc(Html.parse(html))

  /** Variant over an already-parsed document (the extraction kernel parses
    * the raw html once and shares the DOM). Does not mutate `doc`. */
  def fromDoc(doc: Html.Doc): String = {
    // baseElements: ['body'] — process body when present, whole doc otherwise
    val base = Html.selectFirst(doc, "body").getOrElse(doc)
    val out = new Out
    val ctx = new InlineCtx
    base.children.foreach(renderNode(_, out, ctx, ListCtx(0), 0))
    flushInline(out, ctx, 0)
    out.result
  }

  // ------------------------------------------------------------- the stream

  /** html-to-text BlockTextBuilder equivalent: text chunks separated by
    * max(required line breaks) accumulated between them. */
  private final class Out {
    private val sb = new StringBuilder
    private var pending = 0
    private var has = false
    def breaks(n: Int): Unit = { if (n > pending) pending = n }
    def chunk(text: String): Unit = {
      if (text.isEmpty) return
      if (has) { var i = 0; while (i < pending) { sb.append('\n'); i += 1 } }
      sb.append(text); has = true; pending = 0
    }
    // v9 suppresses line breaks at the edges but keeps spaces (a leading
    // ` * ` list prefix survives)
    def result: String = sb.toString.replaceAll("^\\n+|\\n+$", "")
  }

  /** An inline word; `verbatim` words bypass the heading word-transform
    * (v9 addInlineString, used for link hrefs). `Break` is the explicit
    * line-break marker emitted by <br>. */
  private final case class Word(text: String, verbatim: Boolean = false)
  private val Break = Word("\n", verbatim = true)

  private final case class ListCtx(indent: Int)

  private final class InlineCtx {
    val words = ArrayBuffer[Word]()
    var prefix: String = ""
    var prefixSet = false
    /** v9 InlineTextBuilder semantics: adjacent text chunks with no
      * whitespace at the boundary continue the SAME word
      * (`before<!-- -->after` -> `beforeafter`, `[src].` glued). */
    var openWord = false
    def nonEmpty: Boolean = words.nonEmpty
    def clear(): Unit = { words.clear(); prefix = ""; prefixSet = false; openWord = false }
  }

  private def flushInline(out: Out, ctx: InlineCtx, quoteDepth: Int,
      transform: String => String = identity): Unit = {
    if (ctx.nonEmpty) {
      val prefix = if (ctx.prefixSet) ctx.prefix else qprefix(quoteDepth)
      val text = wrap(ctx.words.toSeq.map(w =>
        if (w.verbatim) w.text else transform(w.text)), prefix)
      out.chunk(text)
    }
    ctx.clear()
  }

  /** Greedy 80-col wrap over words; `prefix` leads the first line,
    * continuation lines are indented by the prefix length. */
  private def wrap(words: Seq[String], prefix: String): String = {
    val lines = ArrayBuffer[String]()
    var cur = new StringBuilder
    words.foreach { w =>
      if (w == "\n") { // explicit line-break marker
        lines += cur.toString; cur = new StringBuilder
      } else if (cur.isEmpty) {
        cur.append(w)
      } else if (prefix.length + cur.length + 1 + w.length <= wrapWidth) {
        cur.append(' ').append(w)
      } else {
        lines += cur.toString
        cur = new StringBuilder(w)
      }
    }
    if (cur.nonEmpty || lines.isEmpty) lines += cur.toString
    val joined = lines.zipWithIndex.map { case (l, i) =>
      if (i == 0) prefix + l
      else (" " * prefix.length) + l
    }.mkString("\n")
    TrailWsRe.matcher(joined).replaceAll("")
  }

  private val WsSplitRe = java.util.regex.Pattern.compile("[ \\t\\r\\n\\f\\u200b]+")
  private val TrailWsRe = java.util.regex.Pattern.compile("(?m)\\s+$")

  private def isV9Ws(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == '\u200b'

  private def addText(ctx: InlineCtx, t: String): Unit = {
    if (t.isEmpty) return
    // v9 whitespaceCharacters ' \t\r\n\f​' — U+00A0 is a word character
    val leadWs = isV9Ws(t.charAt(0))
    val trailWs = isV9Ws(t.charAt(t.length - 1))
    val parts = WsSplitRe.split(t).filter(_.nonEmpty)
    if (parts.isEmpty) { ctx.openWord = false; return }
    var rest: Seq[String] = parts.toSeq
    if (!leadWs && ctx.openWord && ctx.words.nonEmpty && (ctx.words.last ne Break)) {
      val last = ctx.words.last
      ctx.words(ctx.words.length - 1) = Word(last.text + rest.head, last.verbatim)
      rest = rest.tail
    }
    ctx.words ++= rest.map(Word(_))
    ctx.openWord = !trailWs
  }

  private def renderNode(node: Html.Node, out: Out, ctx: InlineCtx,
      list: ListCtx, quoteDepth: Int): Unit = node match {
    case Html.Text(t) => addText(ctx, t)
    case _: Html.Comment | _: Html.Doctype => ()
    case e: Html.Elem if skip.contains(e.tag) => ()
    case e: Html.Elem =>
      e.tag match {
        case "br" =>
          ctx.words += Break
          ctx.openWord = false

        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          flushInline(out, ctx, quoteDepth)
          out.breaks(3)
          val inner = new InlineCtx
          e.children.foreach(renderNode(_, out, inner, list, quoteDepth))
          flushInline(out, inner, quoteDepth, transform = _.toUpperCase)
          out.breaks(2)

        case "p" =>
          flushInline(out, ctx, quoteDepth)
          out.breaks(2)
          val inner = new InlineCtx
          e.children.foreach(renderNode(_, out, inner, list, quoteDepth))
          flushInline(out, inner, quoteDepth)
          out.breaks(2)

        case "a" =>
          // v9 formatAnchor: `text [href]`; mailto: stripped; `#...` hidden
          // (noAnchorUrl); brackets kept when href equals text
          // (hideLinkHrefIfSameAsText default false)
          val inner = new InlineCtx
          e.children.foreach(renderNode(_, out, inner, list, quoteDepth))
          val text = inner.words.filter(_ ne Break).map(_.text).mkString(" ")
          val href0 = e.attr("href").getOrElse("").replaceFirst("^mailto:", "")
          val href = if (href0.startsWith("#")) "" else href0
          if (text.nonEmpty) addText(ctx, text)
          if (href.nonEmpty) { ctx.words += Word(s"[$href]", verbatim = true); ctx.openWord = true }

        case "img" =>
          val alt = e.attr("alt").getOrElse("").trim
          val src = e.attr("src").getOrElse("").trim
          if (alt.nonEmpty) addText(ctx, alt)
          if (src.nonEmpty) { ctx.words += Word(s"[$src]", verbatim = true); ctx.openWord = true }

        case "ul" | "ol" =>
          // v9 formatList: ` * ` / ` N. ` prefixes (start attr honored),
          // 1 line break between items, 2 around the list; nested lists
          // (parent <li>) use 1 and a trimStart'ed prefix indented to the
          // parent item's content column
          val nested = list.indent > 0
          flushInline(out, ctx, quoteDepth)
          out.breaks(if (nested) 1 else 2)
          val start = e.attr("start").flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(1)
          var index = start - 1
          var first = true
          e.children.foreach {
            case li: Html.Elem if li.tag == "li" =>
              index += 1
              if (!first) out.breaks(1)
              first = false
              val marker0 = if (e.tag == "ul") " * " else s" $index. "
              val marker = if (nested) marker0.substring(1) else marker0
              val inner = new InlineCtx
              inner.prefix = qprefix(quoteDepth) + (" " * list.indent) + marker
              inner.prefixSet = true
              li.children.foreach(renderNode(_, out, inner,
                ListCtx(list.indent + marker.length), quoteDepth))
              flushInline(out, inner, quoteDepth)
            case other => renderNode(other, out, ctx, list, quoteDepth)
          }
          out.breaks(if (nested) 1 else 2)

        case "blockquote" =>
          // v9 formatBlockquote: render inner content normally, then prefix
          // EVERY line (including empty separator lines) with `> ` after
          // trimming edge line breaks (trimEmptyLines default)
          flushInline(out, ctx, quoteDepth)
          val sub = new Out
          val subCtx = new InlineCtx
          e.children.foreach(renderNode(_, sub, subCtx, ListCtx(0), quoteDepth))
          flushInline(sub, subCtx, quoteDepth)
          val inner = sub.result
          if (inner.nonEmpty) {
            out.breaks(2)
            out.chunk(inner.split("\n", -1).map("> " + _).mkString("\n"))
            out.breaks(2)
          }

        case "pre" =>
          flushInline(out, ctx, quoteDepth)
          val raw = e.text
          if (raw.trim.nonEmpty) {
            out.breaks(2)
            out.chunk(raw.stripLineEnd.replaceAll("^\\n+", ""))
            out.breaks(2)
          }

        case "hr" =>
          flushInline(out, ctx, quoteDepth)
          out.breaks(2)
          out.chunk("-" * 40)
          out.breaks(2)

        case "table" =>
          // documented approximation of v9 dataTable: rows as lines,
          // cells space-joined (no column alignment)
          flushInline(out, ctx, quoteDepth)
          out.breaks(2)
          var firstRow = true
          Html.select(e, "tr").foreach { tr =>
            val cells = tr.elementChildren.filter(c => c.tag == "td" || c.tag == "th")
              .map(_.text.trim.replaceAll("\\s+", " ")).filter(_.nonEmpty)
            if (cells.nonEmpty) {
              if (!firstRow) out.breaks(1)
              firstRow = false
              out.chunk(cells.mkString(" "))
            }
          }
          out.breaks(2)

        case t if softBlocks.contains(t) =>
          // v9 'block' format: leading/trailing 1 line break
          flushInline(out, ctx, quoteDepth)
          out.breaks(1)
          e.children.foreach(renderNode(_, out, ctx, list, quoteDepth))
          flushInline(out, ctx, quoteDepth)
          out.breaks(1)

        case _ =>
          // v9 default: anything not in the selector list is inline
          e.children.foreach(renderNode(_, out, ctx, list, quoteDepth))
      }
  }

  private def qprefix(depth: Int): String = "> " * depth
}

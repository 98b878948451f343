package graft.sources

import java.sql.Timestamp
import graft.core.UrlOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Sitemap reader (the public sitemaps.org protocol — the discovery channel
 * robots.txt `Sitemap:` lines point a crawler at). Three body formats:
 *
 *   - `<urlset>`: `<url>` entries with `<loc>` (required), optional
 *     `<lastmod>` (W3C datetime — date-only or full ISO instant),
 *     `<changefreq>` (closed enum; anything else is dropped to null),
 *     `<priority>` (0.0–1.0 decimal, kept exact as integer millis);
 *   - `<sitemapindex>`: `<sitemap><loc>` members — emitted as
 *     `kind='sitemap'` rows so the crawl loop can enqueue them as the next
 *     frontier generation (index expansion IS a BSP round, not recursion
 *     inside the parser — an index of 50k sitemaps must fan out as rows);
 *   - plain text: one URL per line (kind='url', no metadata).
 *
 * The XML scan is a hand-rolled tag walker (no XML dependency): local tag
 * names matched case-insensitively with any namespace prefix ignored,
 * attributes ignored, `&amp; &lt; &gt; &quot; &apos; &#NNN; &#xHH;`
 * entities unescaped in text content, CDATA sections taken verbatim.
 * Malformed nesting fails loudly (a silently half-read sitemap would
 * under-seed the crawl); unknown child tags are skipped.
 *
 * Scale shape: [[entries]] is one kernel scan over fetched bodies — zero
 * shuffle, composes with the fetch join's partitioning. [[read]] mirrors
 * [[Warc.read]] for file drops (per-file tasks, gzip by magic peek).
 */
object Sitemap {

  /** One parsed row; kind is 'url' (a page) or 'sitemap' (an index member). */
  final case class Entry(kind: String, url: String, lastmodTs: Option[Timestamp],
    changefreq: Option[String], priorityMilli: Option[Long])

  private val ChangeFreqs = Set(
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  // ---------------------------------------------------------------- entities

  /** Unescape the five XML named entities + numeric character references. */
  private[sources] def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val end = s.indexOf(';', i + 1)
        val name = if (end > i) s.substring(i + 1, end) else ""
        val rep: String = name match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case n if n.startsWith("#x") || n.startsWith("#X") =>
            codePoint(n.substring(2), 16)
          case n if n.startsWith("#") =>
            codePoint(n.substring(1), 10)
          case _ => null
        }
        if (rep != null) { out.append(rep); i = end + 1 }
        else { out.append(c); i += 1 } // not a recognized entity: literal '&'
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Numeric character reference → string, or null when invalid. */
  private def codePoint(digits: String, radix: Int): String =
    try {
      val cp = Integer.parseInt(digits, radix)
      if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
      else null
    } catch { case _: NumberFormatException => null }

  // --------------------------------------------------------------- tag walk

  /** Index of the '>' that ends the tag opened at `lt`, honoring quoted
    * attribute values (a '>' inside "…" or '…' does not close the tag);
    * -1 when the tag never terminates. */
  private def tagEnd(s: String, lt: Int): Int = {
    var j = lt + 1
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j
      j += 1
    }
    -1
  }

  /** Minimal forward scanner: next tag at/after `from`, as (localName
    * lowercased, isClose, isSelfClose, endIndexExclusive); skips comments,
    * processing instructions and DOCTYPE. None when no tag remains. */
  private def nextTag(s: String, from: Int): Option[(String, Boolean, Boolean, Int)] = {
    var i = s.indexOf('<', from)
    while (i >= 0) {
      if (s.startsWith("<!--", i)) {
        val e = s.indexOf("-->", i + 4)
        if (e < 0) return None
        i = s.indexOf('<', e + 3)
      } else if (s.startsWith("<?", i) || s.startsWith("<!", i)) {
        val e = s.indexOf('>', i + 1)
        if (e < 0) return None
        i = s.indexOf('<', e + 1)
      } else {
        val e = tagEnd(s, i)
        if (e < 0) return None
        val isClose = s.charAt(i + 1) == '/'
        val selfClose = s.charAt(e - 1) == '/'
        val nameStart = if (isClose) i + 2 else i + 1
        var nameEnd = nameStart
        while (nameEnd < e && !s.charAt(nameEnd).isWhitespace &&
          s.charAt(nameEnd) != '/' && s.charAt(nameEnd) != '>') nameEnd += 1
        val raw = s.substring(nameStart, nameEnd)
        val local = raw.substring(raw.indexOf(':') + 1).toLowerCase
        return Some((local, isClose, selfClose, e + 1))
      }
    }
    None
  }

  /** Text content of the element whose open tag ends at `from`, up to its
    * matching close tag; CDATA verbatim, entities unescaped, trimmed.
    * Returns (text, indexAfterCloseTag). */
  private def textUntilClose(s: String, from: Int, name: String): (String, Int) = {
    var i = from
    // java.lang.StringBuilder: scala's lacks the 3-arg (CharSequence,
    // start, end) append and would silently auto-tuple the arguments
    val sb = new java.lang.StringBuilder
    while (true) {
      val lt = s.indexOf('<', i)
      if (lt < 0) throw new IllegalArgumentException(
        s"sitemap: unterminated <$name> element")
      sb.append(s, i, lt)
      if (s.startsWith("<![CDATA[", lt)) {
        val e = s.indexOf("]]>", lt + 9)
        if (e < 0) throw new IllegalArgumentException(
          s"sitemap: unterminated CDATA in <$name>")
        sb.append(s, lt + 9, e)
        i = e + 3
      } else {
        nextTag(s, lt) match {
          case Some((n, true, _, end)) if n == name =>
            return (unescape(sb.toString).trim, end)
          case Some((_, _, _, end)) => i = end // nested/unknown markup: skip tag
          case None => throw new IllegalArgumentException(
            s"sitemap: unterminated <$name> element")
        }
      }
    }
    ("", from) // unreachable
  }

  // ------------------------------------------------------------------ parse

  /** W3C datetime: full ISO instant, ISO with offset, or date-only (taken
    * as midnight UTC). Unparseable values become None, never a default. */
  private[sources] def parseLastmod(v: String): Option[Timestamp] = {
    val t = v.trim
    if (t.isEmpty) return None
    try Some(Timestamp.from(java.time.OffsetDateTime.parse(t).toInstant))
    catch { case _: java.time.format.DateTimeParseException =>
      try Some(Timestamp.from(
        java.time.LocalDate.parse(t).atStartOfDay(java.time.ZoneOffset.UTC).toInstant))
      catch { case _: java.time.format.DateTimeParseException => None }
    }
  }

  /** 0.0–1.0 decimal kept exact in integer millis (BigDecimal — never a
    * double round-trip; >3 decimals round half-up); out-of-range or
    * malformed becomes None. */
  private[sources] def parsePriority(v: String): Option[Long] =
    try {
      val m = (BigDecimal(v.trim) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      if (m >= 0L && m <= 1000L) Some(m) else None
    } catch { case _: Exception => None }

  /** Exact root probe: true iff the body's first real tag (after BOM/decl/
    * comments/DOCTYPE) is `<urlset>` or `<sitemapindex>` — the crawl loop's
    * opt-in sitemap fan-out keys on this without a full parse. Plain-text
    * sitemaps are NOT detectable (any text qualifies) and stay a
    * [[read]]-path-only format. */
  def isSitemap(body: String): Boolean = {
    if (body == null) return false
    val i = body.indexWhere(c => !c.isWhitespace && c != '\uFEFF')
    if (i < 0 || body.charAt(i) != '<') return false
    nextTag(body, i) match {
      case Some((name, false, _, _)) => name == "urlset" || name == "sitemapindex"
      case _ => false
    }
  }

  /** Parse one sitemap body (auto-detected XML urlset / XML sitemapindex /
    * plain text). Order-preserving. */
  def parse(body: String): Seq[Entry] = {
    val trimmed = body.dropWhile(c => c.isWhitespace || c == '\uFEFF')
    if (!trimmed.startsWith("<")) {
      // plain-text sitemap: one URL per line
      return trimmed.linesIterator.map(_.trim).filter(_.nonEmpty)
        .map(u => Entry("url", u, None, None, None)).toSeq
    }
    val s = body
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    var i = 0
    var root: String = null // "urlset" | "sitemapindex"
    var done = false
    while (!done) {
      nextTag(s, i) match {
        case None =>
          if (root == null) throw new IllegalArgumentException(
            "sitemap: no <urlset> or <sitemapindex> root")
          done = true
        case Some((name, isClose, selfClose, end)) =>
          i = end
          name match {
            case "urlset" | "sitemapindex" if !isClose =>
              if (root != null) throw new IllegalArgumentException(
                s"sitemap: nested <$name> root")
              root = name
            case "url" | "sitemap" if !isClose && !selfClose =>
              if (root == null) throw new IllegalArgumentException(
                s"sitemap: <$name> outside a root element")
              val kind = if (name == "url") "url" else "sitemap"
              var loc: String = null
              var lastmod: Option[Timestamp] = None
              var freq: Option[String] = None
              var prio: Option[Long] = None
              var inEntry = true
              while (inEntry) {
                nextTag(s, i) match {
                  case Some((n, true, _, e)) if n == name =>
                    i = e; inEntry = false
                  case Some((n, false, false, e)) =>
                    val (text, after) = textUntilClose(s, e, n)
                    n match {
                      case "loc" => loc = text
                      case "lastmod" => lastmod = parseLastmod(text)
                      case "changefreq" =>
                        freq = Some(text.toLowerCase).filter(ChangeFreqs)
                      case "priority" => prio = parsePriority(text)
                      case _ => // unknown child (image:, video:, news:): skipped
                    }
                    i = after
                  case Some((_, _, _, e)) => i = e // self-closing child
                  case None => throw new IllegalArgumentException(
                    s"sitemap: unterminated <$name> entry")
                }
              }
              if (loc != null && loc.nonEmpty)
                out += Entry(kind, loc, lastmod, freq, prio)
            case _ => // close tags, self-closing, unknown elements: skip
          }
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------ spark

  /** One kernel scan over fetched sitemap bodies:
    * DataFrame(sitemap_url, kind, url, lastmod_ts, changefreq,
    * priority_milli). `kind='sitemap'` rows are index members — the crawl
    * loop's next frontier generation, not recursed here. */
  def entries(pages: DataFrame, urlCol: String, bodyCol: String): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col(urlCol).cast("string"), col(bodyCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (smUrl, body) =>
        // null body (failed fetch in a fetch-join output) contributes nothing
        if (body == null) Iterator.empty
        else parse(body).iterator.map(e => (smUrl, e.kind,
          // relative locs resolve against the sitemap's own URL (protocol
          // requires absolute, but real-world feeds violate it)
          if (e.url.contains("://") || smUrl == null) e.url
          else UrlOps.resolve(smUrl, e.url),
          e.lastmodTs.orNull, e.changefreq.orNull,
          e.priorityMilli.map(java.lang.Long.valueOf).orNull))
      }
      .toDF("sitemap_url", "kind", "url", "lastmod_ts", "changefreq",
        "priority_milli")
  }

  /** File-drop variant (mirrors [[Warc.read]]): .xml / .txt / .gz by magic
    * peek, one streaming task per file. */
  def read(spark: SparkSession, pathGlob: String,
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, mp)
      .flatMap { case (path, pds) =>
        val in = pds.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        try {
          val dec = Warc.decoded(in)
          val body = new String(dec.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          parse(body).map(e => (path, e.kind, e.url,
            e.lastmodTs.orNull, e.changefreq.orNull,
            e.priorityMilli.map(java.lang.Long.valueOf).orNull))
        } finally in.close()
      }
      .toDF("sitemap_url", "kind", "url", "lastmod_ts", "changefreq",
        "priority_milli")
  }
}

package graft.core

/**
 * The HTML extraction kernel: one parse, all formats — the Spark-side analog
 * of the reference's `DataExtractor.extractData`
 * (`packages/scrape/src/core/DataExtractor.ts:230-341`), where the cleaned
 * HTML is computed once and markdown derives from it, all formats sharing
 * the single parsed DOM (the reference's per-format promise DAG collapses to
 * straight-line code here).
 *
 * Invoked executor-side from a `mapPartitions` over (url, html) — the single
 * opaque (non-codegen) stage in the extraction plan; everything before and
 * after stays in whole-stage codegen. Format selection prunes work: callers
 * pass only the formats they need so unneeded serializers never run
 * (mirroring `formats` at DataExtractor.ts:251-277).
 */
object Extractor {

  final case class MetaEntry(name: String, content: String, property: Option[String])

  final case class Extracted(
      url: String,
      title: String,
      metadata: Seq[MetaEntry],
      html: Option[String],     // cleaned + absolutized (format "html")
      markdown: Option[String], // format "markdown"
      text: Option[String],     // format "text" (over *raw* html, :276)
      links: Seq[String],       // absolutized out-links in document order
      rawHtml: Option[String] = None) // format "rawHtml" (DataExtractor.ts:272-274)

  final case class Formats(
      html: Boolean = true,
      markdown: Boolean = true,
      text: Boolean = true,
      links: Boolean = true,
      rawHtml: Boolean = false)

  def extract(url: String, rawHtml: String, formats: Formats = Formats(),
      cleanOpts: Cleaner.Options = Cleaner.Options(),
      honorNofollow: Boolean = false): Extracted = {
    val doc = Html.parse(rawHtml)

    // title ($('title').text().trim(), DataExtractor.ts:158-162)
    val title = Html.selectFirst(doc, "title").map(_.text.trim).getOrElse("")

    // metadata (<meta> with (name|property)+content, DataExtractor.ts:175-198)
    // JS truthiness: `(name || property) && content` — empty content drops
    // the entry (DataExtractor.ts:183)
    val metadata = Html.select(doc, "meta").flatMap { m =>
      val name = m.attr("name").filter(_.nonEmpty)
      val property = m.attr("property").filter(_.nonEmpty)
      val content = m.attr("content").filter(_.nonEmpty)
      (name.orElse(property), content) match {
        case (Some(n), Some(c)) => Some(MetaEntry(n, c.trim, property))
        case _ => None
      }
    }

    // links extracted from the RAW dom before cleaning (Crawlee enqueueLinks
    // operates on the fetched page, not the cleaned one): every a[href],
    // resolved against the page url (Base.ts:362-403 + HTMLTransformer
    // resolve semantics).
    val links: Seq[String] =
      if (formats.links) LinkExtractor.extract(doc, url, honorNofollow) else Nil

    // One cleaned DOM serves both the html format (rendered) and the
    // markdown converter (DOM handoff — no serialize/re-parse roundtrip);
    // text shares the raw parse. Byte-identity across these paths is pinned
    // by the golden corpus.
    val needClean = formats.html || formats.markdown
    val cleanedDoc: Option[Either[Html.Elem, Html.Doc]] =
      if (needClean) Some(Cleaner.transformDoc(doc, url, cleanOpts)) else None
    val cleaned: Option[String] =
      if (formats.html) cleanedDoc.map {
        case Left(root) => Html.renderChildren(root)
        case Right(d)   => Html.render(d)
      } else None

    // fromCleanedDoc mutates its input — run it AFTER the html render
    val markdown =
      if (formats.markdown) cleanedDoc.map {
        case Left(root) => Markdown.fromCleanedDoc(root)
        case Right(d)   => Markdown.fromCleanedDoc(d)
      } else None
    val text = if (formats.text) Some(TextExtract.fromDoc(doc)) else None

    Extracted(url, title, metadata,
      if (formats.html) cleaned else None,
      markdown, text, links,
      if (formats.rawHtml) Some(rawHtml) else None)
  }
}

/**
 * Out-link extraction: the UDTF-shaped half of Crawlee's `enqueueLinks`
 * (Base.ts:362-403) — collect `a[href]`, resolve each against the page URL
 * (with the reference's malformed-scheme repair + return-input fallback),
 * keep only http(s), preserve document order, de-dup within the page.
 */
object LinkExtractor {
  /** Every qualifying out-link occurrence of the page, document order,
    * duplicates kept, as (resolvedTarget, anchorElem). This is the ONE
    * definition of the href skip rules (fragment/javascript/mailto/tel),
    * the resolveOpt repair, and the http(s)-scheme gate: frontier expansion
    * ([[extract]], per-page dedup) and anchor-text evidence
    * (graft.pipeline.Anchors, occurrences kept) both derive from it, so a
    * skip-rule change cannot silently diverge the two paths. */
  def occurrences(doc: Html.Doc, baseUrl: String): Seq[(String, Html.Elem)] = {
    val out = Seq.newBuilder[(String, Html.Elem)]
    Html.select(doc, "a[href]").foreach { a =>
      a.attr("href").map(_.trim).filter(_.nonEmpty).foreach { href =>
        val lower = href.toLowerCase
        if (!href.startsWith("#") && !lower.startsWith("javascript:") &&
            !lower.startsWith("mailto:") && !lower.startsWith("tel:")) {
          // Crawlee enqueueLinks skips hrefs `new URL` rejects — resolveOpt
          // None mirrors that (e.g. `http://` with an empty host)
          UrlOps.resolveOpt(baseUrl, href).foreach { abs =>
            val scheme = UrlOps.parse(abs).flatMap(_.scheme).map(_.toLowerCase)
            if (scheme.contains("http") || scheme.contains("https"))
              out += ((abs, a))
          }
        }
      }
    }
    out.result()
  }

  def extract(doc: Html.Doc, baseUrl: String,
      honorNofollow: Boolean = false): Seq[String] = {
    if (honorNofollow && metaNofollow(doc)) return Nil
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    occurrences(doc, baseUrl).foreach { case (abs, a) =>
      if (!(honorNofollow && relNofollow(a))) seen += abs
    }
    seen.toSeq
  }

  /** rel attribute declares the nofollow link type. Tokens are ASCII-
    * whitespace-separated per the HTML spec; commas are tolerated as
    * separators too (major crawlers accept `rel="nofollow, noopener"`),
    * matching case-insensitively so `rel="NoFollow"` counts. */
  def relNofollow(a: Html.Elem): Boolean =
    a.attr("rel").exists(hasToken(_, "nofollow"))

  /** Page-level robots nofollow: a `<meta name="robots">` whose content
    * carries the `nofollow` or `none` directive (none = noindex,nofollow per
    * the robots meta-tag convention). Applies to every link on the page. */
  def metaNofollow(doc: Html.Doc): Boolean =
    Html.select(doc, "meta").exists { m =>
      m.attr("name").exists(_.equalsIgnoreCase("robots")) &&
        m.attr("content").exists(c => hasToken(c, "nofollow") || hasToken(c, "none"))
    }

  private def hasToken(value: String, token: String): Boolean =
    value.split("[\\s,]+").exists(_.equalsIgnoreCase(token))

  def extractFromHtml(html: String, baseUrl: String): Seq[String] =
    extract(Html.parse(html), baseUrl)
}

package graft.core

/**
 * Main-content cleaning + relative-URL rewriting, reproducing the reference's
 * `HTMLTransformer` (packages/scrape/src/core/transformers/HTMLTransformer.ts):
 *
 *  - the 46-selector non-main-content removal list (`:21-66`)
 *  - include_tags projection into a `<div>` root (`:107-122`)
 *  - exclude_tags removal + comment stripping (`:130-139`)
 *  - `img@srcset` parse/absolutize/pick-largest (`:235-318`)
 *  - `img@src` / `a@href` absolutization (`:323-360`)
 *
 * Pure DOM-in/DOM-out functions; executed inside the extraction
 * `mapPartitions` kernel (no Spark types here).
 */
object Cleaner {

  /** HTMLTransformer.ts:21-66 — kept byte-for-byte equal as *selectors*
    * (the list itself is data, not code). */
  val ExcludeNonMainTags: Seq[String] = Seq(
    "header", "footer", "nav", "aside",
    ".header", ".top", ".navbar", "#header",
    ".footer", ".bottom", "#footer",
    ".sidebar", ".side", ".aside", "#sidebar",
    ".modal", ".popup", "#modal", ".overlay",
    ".ad", ".ads", ".advert", "#ad",
    ".lang-selector", ".language", "#language-selector",
    ".social", ".social-media", ".social-links", "#social",
    ".menu", ".navigation", "#nav",
    ".breadcrumbs", "#breadcrumbs",
    ".share", "#share",
    ".widget", "#widget",
    ".cookie", "#cookie",
    "script", "style", "noscript")

  final case class Options(
      includeTags: Seq[String] = Nil,
      excludeTags: Seq[String] = Nil,
      transformRelativeUrls: Boolean = true)

  /** transformHtml (HTMLTransformer.ts:77-88): absolutize URLs then clean;
    * returns serialized HTML. */
  def transformHtml(doc: Html.Doc, baseUrl: String, opts: Options = Options()): String =
    transformDoc(doc, baseUrl, opts) match {
      case Left(root) => Html.renderChildren(root) // include_tags projection
      case Right(d)   => Html.render(d)
    }

  /** DOM-level variant of [[transformHtml]] for callers that feed the
    * markdown converter directly (no serialize/re-parse roundtrip):
    * Left(divRoot) for the include_tags projection (render its CHILDREN),
    * Right(doc) for the standard cleaning path. The input doc is never
    * mutated. */
  def transformDoc(doc: Html.Doc, baseUrl: String,
      opts: Options = Options()): Either[Html.Elem, Html.Doc] = {
    val clone = doc.deepCopy
    if (opts.transformRelativeUrls) rewriteUrls(clone, baseUrl)
    if (opts.includeTags.nonEmpty) {
      // Projection mode: collect matches under a fresh <div> root (:109-122)
      val root = new Html.Elem("div", Vector.empty, scala.collection.mutable.ArrayBuffer.empty)
      opts.includeTags.foreach { sel =>
        Html.select(clone, sel).foreach(m => root.children += m.deepCopy)
      }
      Left(root)
    } else {
      removeSelectors(clone, ExcludeNonMainTags)
      if (opts.excludeTags.nonEmpty) removeSelectors(clone, opts.excludeTags)
      Html.removeComments(clone)
      Right(clone)
    }
  }


  def removeSelectors(doc: Html.Doc, selectors: Seq[String]): Unit = {
    val chains = selectors.flatMap(Selector.parseSelector)
    // Single-pass removal: every selector in the reference's list (and the
    // option surface) is a simple selector, so a predicate test per element
    // suffices — O(elements × selectors) with no re-walks. Multi-part chains
    // (possible via user exclude_tags) are resolved to an identity set once,
    // up front, not per element.
    val singles: Array[Selector.Simple] =
      chains.collect { case ch if ch.parts.length == 1 => ch.parts.head._2 }.toArray
    val multis = chains.filter(_.parts.length > 1)
    val multiMatched: java.util.IdentityHashMap[Html.Elem, java.lang.Boolean] =
      if (multis.isEmpty) null
      else {
        val m = new java.util.IdentityHashMap[Html.Elem, java.lang.Boolean]()
        multis.foreach(ch => Html.select(doc, renderChain(ch)).foreach(e => m.put(e, java.lang.Boolean.TRUE)))
        m
      }
    Html.removeWhere(doc) { e =>
      {
        var i = 0; var hit = false
        while (i < singles.length && !hit) { hit = singles(i).matches(e); i += 1 }
        hit
      } || (multiMatched != null && multiMatched.containsKey(e))
    }
  }

  private def renderChain(ch: Selector.Chain): String =
    ch.parts.map { case (c, s) =>
      val comb = if (c == '>') "> " else ""
      val tag = s.tag.getOrElse("")
      val id = s.id.map("#" + _).getOrElse("")
      val cls = s.classes.map("." + _).mkString
      val at = s.attrs.map { case (k, Some(v)) => s"""[$k="$v"]"""; case (k, None) => s"[$k]" }.mkString
      comb + tag + id + cls + at
    }.mkString(" ")

  // --------------------------------------------------------- URL rewriting

  /** transformRelativeUrls (HTMLTransformer.ts:215-229): srcset, img src,
    * a href — in that order. No-op if the base URL does not parse. */
  def rewriteUrls(doc: Html.Doc, baseUrl: String): Unit = {
    if (UrlOps.parse(baseUrl.trim).flatMap(_.scheme).isEmpty) return
    rewriteSrcset(doc, baseUrl)
    Html.select(doc, "img[src]").foreach { img =>
      img.attr("src").filter(_.nonEmpty).foreach(src => img.setAttr("src", UrlOps.resolve(baseUrl, src)))
    }
    Html.select(doc, "a[href]").foreach { a =>
      a.attr("href").filter(_.nonEmpty).foreach(href => a.setAttr("href", UrlOps.resolve(baseUrl, href)))
    }
  }

  /** srcset transform (HTMLTransformer.ts:235-318): absolutize every entry,
    * pick the largest (width descriptors win by value; pure pixel-density
    * lists also consider `src` as 1x) as the new `src`, rebuild srcset. */
  private def rewriteSrcset(doc: Html.Doc, baseUrl: String): Unit = {
    Html.select(doc, "img[srcset]").foreach { img =>
      img.attr("srcset").filter(_.nonEmpty).foreach { srcset =>
        val entries = srcset.split(',').map(_.trim).filter(_.nonEmpty)
        final case class Src(url: String, size: Double, isDensity: Boolean)
        val sources = entries.toSeq.map { entry =>
          val parts = entry.split("\\s+")
          val url = parts(0)
          val desc = if (parts.length > 1) parts(1) else "1x"
          var size = 1.0
          var isDensity = true
          if (desc.endsWith("x")) {
            try { size = desc.dropRight(1).toDouble } catch { case _: Exception => }
          } else if (desc.endsWith("w")) {
            try { size = desc.dropRight(1).toInt.toDouble; isDensity = false } catch { case _: Exception => }
          }
          Src(UrlOps.resolve(baseUrl, url), size, isDensity)
        }
        val withFallback =
          if (sources.forall(_.isDensity))
            img.attr("src").filter(_.nonEmpty) match {
              case Some(src) => sources :+ Src(UrlOps.resolve(baseUrl, src), 1.0, isDensity = true)
              case None      => sources
            }
          else sources
        val sorted = withFallback.sortBy(-_.size)
        sorted.headOption.foreach(best => img.setAttr("src", best.url))
        val rebuilt = entries.map { entry =>
          val parts = entry.split("\\s+")
          if (parts.isEmpty || parts(0).isEmpty) entry
          else {
            val abs = UrlOps.resolve(baseUrl, parts(0))
            if (parts.length > 1) s"$abs ${parts(1)}" else abs
          }
        }.mkString(", ")
        img.setAttr("srcset", rebuilt)
      }
    }
  }
}

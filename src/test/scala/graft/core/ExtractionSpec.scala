package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Extraction semantics locked against the reference's rules:
  * Cleaner == HTMLTransformer.ts, Markdown == html-to-markdown.ts,
  * TextExtract == html-to-text defaults, Extractor == DataExtractor.ts. */
class ExtractionSpec extends AnyFunSuite {

  test("cleaner removes the 46-selector noise list and comments") {
    val html =
      """<html><body><header>H</header><nav>N</nav><div class="ad">AD</div>
        |<div id="sidebar">S</div><script>s()</script><style>.x{}</style>
        |<!-- gone --><p>content</p><aside>A</aside></body></html>""".stripMargin.replaceAll("\n", "")
    val out = Cleaner.transformHtml(Html.parse(html), "https://h.test/")
    assert(!out.contains("header"))
    assert(!out.contains("AD"))
    assert(!out.contains("sidebar"))
    assert(!out.contains("script"))
    assert(!out.contains("gone"))
    assert(out.contains("<p>content</p>"))
  }

  test("include_tags projects into a div root (HTMLTransformer.ts:107-122)") {
    val html = """<body><h1>T</h1><p class="keep">a</p><p>b</p><p class="keep">c</p></body>"""
    val out = Cleaner.transformHtml(Html.parse(html), "https://h.test/",
      Cleaner.Options(includeTags = Seq("p.keep")))
    assert(out == """<p class="keep">a</p><p class="keep">c</p>""")
  }

  test("href/src absolutization + srcset largest-wins (HTMLTransformer.ts:235-360)") {
    val html =
      """<body><a href="/x">l</a><a href="sub/y.html">m</a>
        |<img src="i.png" srcset="a.png 480w, b.png 800w">
        |<img src="c.png" srcset="d.png 2x, e.png 1.5x"></body>"""
        .stripMargin.replaceAll("\n", "")
    val out = Cleaner.transformHtml(Html.parse(html), "https://h.test/dir/page.html")
    assert(out.contains("""href="https://h.test/x""""))
    assert(out.contains("""href="https://h.test/dir/sub/y.html""""))
    // width descriptors: 800w wins
    assert(out.contains("""src="https://h.test/dir/b.png""""))
    assert(out.contains("""srcset="https://h.test/dir/a.png 480w, https://h.test/dir/b.png 800w""""))
    // density descriptors: 2x wins over implicit src@1x
    assert(out.contains("""src="https://h.test/dir/d.png""""))
  }

  test("markdown: headings, paragraphs, em/strong, links, lists") {
    val md = Markdown.fromHtml(
      """<h1>Title</h1><h3>Sub</h3><p>Hello <em>world</em> and <strong>bold</strong>.</p>
        |<p>See <a href="https://h.test/x">the docs</a>.</p>
        |<ul><li>one</li><li>two</li></ul>""".stripMargin)
    assert(md.startsWith("Title\n=====\n\n### Sub"))
    assert(md.contains("Hello *world* and **bold**."))
    assert(md.contains("[the docs](https://h.test/x)"))
    assert(md.contains("*   one\n*   two"))
  }

  test("markdown: div inline vs block (html-to-markdown.ts:44-70)") {
    assert(Markdown.fromHtml("""<div>a</div><div>b</div>""") == "a b")
    assert(Markdown.fromHtml("""<div><p>a</p></div>""") == "a")
  }

  test("markdown: span spacing (html-to-markdown.ts:73-103)") {
    // faithful to the reference: BOTH spans add their own separator
    // (suffix of the first + prefix of the second), yielding a double space —
    // html-to-markdown.ts:87-101 does exactly this.
    assert(Markdown.fromHtml("""<p><span>a</span><span>b</span></p>""") == "a  b")
    assert(Markdown.fromHtml("""<p>x<span>a</span></p>""") == "x a")
  }

  test("markdown: anchor-wrapped image (html-to-markdown.ts:106-127)") {
    val md = Markdown.fromHtml("""<a href="https://h.test/p"><img src="https://h.test/i.png" alt="pic"></a>""")
    assert(md == "[![pic](https://h.test/i.png)](https://h.test/p)")
    val md2 = Markdown.fromHtml("""<a href="#"><img src="https://h.test/i.png" alt="pic"></a>""")
    assert(md2 == "![pic](https://h.test/i.png)")
  }

  test("markdown: figure/figcaption + br (html-to-markdown.ts:130-175)") {
    val md = Markdown.fromHtml(
      """<figure><img src="https://h.test/i.png" alt="a"><figcaption>cap</figcaption></figure>""")
    assert(md == "![a](https://h.test/i.png)\n\ncap")
    assert(Markdown.fromHtml("<p>a<br>b</p>") == "a\nb")
  }

  test("markdown: bracket-wrapped image normalization (html-to-markdown.ts:178-201)") {
    assert(Markdown.postprocess("[ ![x](u) ]") == "![x](u)")
    assert(Markdown.postprocess("[ ![x](u) ](link)") == "[![x](u)](link)")
  }

  test("markdown: script/style/meta removed, whitespace pre-collapse") {
    val md = Markdown.fromHtml("<p>a</p>\n\n   <script>x()</script><p>b</p>")
    assert(md == "a\n\nb")
  }

  test("text: headings uppercased, wrap, links bracketed") {
    val t = TextExtract.fromHtml(
      """<h1>Page Title</h1><p>Hello world.</p><p>Go to <a href="https://h.test/x">docs</a> now.</p>""")
    assert(t.startsWith("PAGE TITLE"))
    assert(t.contains("Hello world."))
    assert(t.contains("docs [https://h.test/x] now."))
  }

  test("text: lists and hr") {
    val t = TextExtract.fromHtml("""<p>intro</p><ul><li>alpha</li><li>beta</li></ul><hr>""")
    assert(t.contains(" * alpha\n * beta"))
    assert(t.contains("-" * 40))
  }

  test("text: word wrap at 80") {
    val long = ("word " * 40).trim
    val t = TextExtract.fromHtml(s"<p>$long</p>")
    assert(t.linesIterator.forall(_.length <= 80))
    assert(t.linesIterator.size > 1)
  }

  test("extractor: title, metadata, links (DataExtractor.ts:158-198)") {
    val html =
      """<html><head><title> My Page </title>
        |<meta name="description" content=" desc ">
        |<meta property="og:title" content="OG">
        |<meta name="empty"><meta content="nameless">
        |</head><body>
        |<a href="/a">A</a><a href="b.html">B</a><a href="#frag">skip</a>
        |<a href="javascript:void(0)">skip</a><a href="mailto:x@y">skip</a>
        |<a href="/a">dup</a>
        |</body></html>""".stripMargin
    val ex = Extractor.extract("https://h.test/dir/page.html", html)
    assert(ex.title == "My Page")
    assert(ex.metadata == Seq(
      Extractor.MetaEntry("description", "desc", None),
      Extractor.MetaEntry("og:title", "OG", Some("og:title"))))
    assert(ex.links == Seq("https://h.test/a", "https://h.test/dir/b.html"))
  }

  test("extractor: format pruning skips serializers") {
    val ex = Extractor.extract("https://h.test/", "<p>x</p>",
      Extractor.Formats(html = false, markdown = false, text = true, links = false))
    assert(ex.html.isEmpty && ex.markdown.isEmpty && ex.links.isEmpty)
    assert(ex.text.contains("x"))
  }

  test("robots: groups, wildcards, longest-match, crawl-delay") {
    val rules = Robots.parse(
      """# comment
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/ok
        |Crawl-delay: 2
        |
        |User-agent: graftbot
        |Disallow: /only-graft/
        |""".stripMargin)
    assert(Robots.allowedUrl(rules, "anybot", "https://h.test/public"))
    assert(!Robots.allowedUrl(rules, "anybot", "https://h.test/private/x"))
    assert(Robots.allowedUrl(rules, "anybot", "https://h.test/private/ok"))
    assert(rules.crawlDelay("anybot").contains(2.0))
    // specific group wins for graftbot
    assert(!Robots.allowedUrl(rules, "graftbot/1.0", "https://h.test/only-graft/x"))
    assert(Robots.allowedUrl(rules, "graftbot/1.0", "https://h.test/private/x"))
    // wildcard + anchor
    val r2 = Robots.parse("User-agent: *\nDisallow: /*.pdf$\n")
    assert(!Robots.allowedUrl(r2, "a", "https://h.test/doc.pdf"))
    assert(Robots.allowedUrl(r2, "a", "https://h.test/doc.pdfx"))
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SitemapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sitemap-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("unescape: named + numeric + hex entities; stray '&' kept literal") {
    assert(Sitemap.unescape("a&amp;b&lt;c&gt;d&quot;e&apos;f") == "a&b<c>d\"e'f")
    assert(Sitemap.unescape("x&#65;y&#x42;z") == "xAyBz")
    assert(Sitemap.unescape("AT&T & friends") == "AT&T & friends")
    assert(Sitemap.unescape("no entities") == "no entities")
  }

  test("parsePriority: exact millis, rounding, range and garbage") {
    assert(Sitemap.parsePriority("0.8") == Some(800L))
    assert(Sitemap.parsePriority("1.0") == Some(1000L))
    assert(Sitemap.parsePriority("0") == Some(0L))
    assert(Sitemap.parsePriority("0.8555") == Some(856L)) // half-up
    assert(Sitemap.parsePriority("1.5") == None)
    assert(Sitemap.parsePriority("-0.1") == None)
    assert(Sitemap.parsePriority("high") == None)
  }

  test("parseLastmod: full instant, offset form, date-only, garbage") {
    assert(Sitemap.parseLastmod("2024-01-05T12:34:56Z").get.toInstant ==
      java.time.Instant.parse("2024-01-05T12:34:56Z"))
    assert(Sitemap.parseLastmod("2024-01-05T12:34:56+02:00").get.toInstant ==
      java.time.Instant.parse("2024-01-05T10:34:56Z"))
    assert(Sitemap.parseLastmod("2024-01-05").get.toInstant ==
      java.time.Instant.parse("2024-01-05T00:00:00Z"))
    assert(Sitemap.parseLastmod("Jan 5") == None)
    assert(Sitemap.parseLastmod("") == None)
  }

  test("urlset: namespaces, XML decl, comments, CDATA, entities, enum " +
       "validation, unknown children skipped, missing loc dropped") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<!-- generated nightly -->
        |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:url>
        |    <sm:loc>https://a.test/p?x=1&amp;y=2</sm:loc>
        |    <sm:lastmod>2024-01-05</sm:lastmod>
        |    <sm:changefreq>WEEKLY</sm:changefreq>
        |    <sm:priority>0.8</sm:priority>
        |  </sm:url>
        |  <sm:url>
        |    <sm:loc><![CDATA[https://a.test/cdata&raw]]></sm:loc>
        |    <sm:changefreq>sometimes</sm:changefreq>
        |    <image:image><image:loc>https://a.test/img.png</image:loc></image:image>
        |  </sm:url>
        |  <sm:url><sm:lastmod>2024-01-01</sm:lastmod></sm:url>
        |</sm:urlset>""".stripMargin
    val got = Sitemap.parse(xml)
    assert(got.size == 2)
    assert(got(0) == Sitemap.Entry("url", "https://a.test/p?x=1&y=2",
      Some(java.sql.Timestamp.from(java.time.Instant.parse("2024-01-05T00:00:00Z"))),
      Some("weekly"), Some(800L)))
    // CDATA verbatim (no entity processing); bogus changefreq -> None; the
    // image:loc must NOT leak into the entry's loc
    assert(got(1) == Sitemap.Entry("url", "https://a.test/cdata&raw",
      None, None, None))
  }

  test("sitemapindex: members come back as kind='sitemap' rows") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.test/s1.xml</loc>
        |    <lastmod>2024-02-01T00:00:00Z</lastmod></sitemap>
        |  <sitemap><loc>https://a.test/s2.xml.gz</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val got = Sitemap.parse(xml)
    assert(got.map(e => (e.kind, e.url)) == Seq(
      ("sitemap", "https://a.test/s1.xml"),
      ("sitemap", "https://a.test/s2.xml.gz")))
    assert(got(0).lastmodTs.isDefined && got(1).lastmodTs.isEmpty)
  }

  test("plain-text sitemap: one URL per line, blanks skipped") {
    val got = Sitemap.parse("\nhttps://t.test/a\n  https://t.test/b  \n\n")
    assert(got == Seq(
      Sitemap.Entry("url", "https://t.test/a", None, None, None),
      Sitemap.Entry("url", "https://t.test/b", None, None, None)))
  }

  test("malformed bodies fail loudly: no root, entry outside root, " +
       "unterminated entry") {
    intercept[IllegalArgumentException](Sitemap.parse("<foo></foo>"))
    intercept[IllegalArgumentException](
      Sitemap.parse("<url><loc>https://x.test/</loc></url>"))
    intercept[IllegalArgumentException](
      Sitemap.parse("<urlset><url><loc>https://x.test/</loc>"))
  }

  test("Spark entries(): one scan over fetched bodies; relative locs " +
       "resolve against the sitemap's own URL") {
    import spark.implicits._
    val pages = Seq(
      ("https://h1.test/sitemap.xml",
        "<urlset><url><loc>/rel/p1</loc><priority>0.5</priority></url>" +
        "<url><loc>https://h1.test/abs</loc></url></urlset>"),
      ("https://h2.test/sitemap_index.xml",
        "<sitemapindex><sitemap><loc>https://h2.test/a.xml</loc></sitemap></sitemapindex>"),
      ("https://h3.test/sitemap.txt", "https://h3.test/only")
    ).toDF("url", "html")
    val df = Sitemap.entries(pages, "url", "html")
    assert(df.columns.toSeq == Seq("sitemap_url", "kind", "url",
      "lastmod_ts", "changefreq", "priority_milli"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("https://h1.test/sitemap.xml", "url", "https://h1.test/rel/p1"),
      ("https://h1.test/sitemap.xml", "url", "https://h1.test/abs"),
      ("https://h2.test/sitemap_index.xml", "sitemap", "https://h2.test/a.xml"),
      ("https://h3.test/sitemap.txt", "url", "https://h3.test/only")))
  }

  test("Spark read(): file drop with plain .xml and gzipped .xml.gz") {
    val dir = java.nio.file.Files.createTempDirectory("sitemapspec")
    val xml = "<urlset><url><loc>https://f.test/x</loc></url></urlset>"
    java.nio.file.Files.write(dir.resolve("a.xml"), xml.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.xml.gz"),
      Warc.gzipMember(
        "<urlset><url><loc>https://f.test/gz</loc></url></urlset>"
          .getBytes("UTF-8")))
    val df = Sitemap.read(spark, dir.toString + "/*")
    assert(df.select("url").collect().map(_.getString(0)).toSet ==
      Set("https://f.test/x", "https://f.test/gz"))
  }

  test("robots.txt Sitemap: directives are collected, grouping unchanged") {
    val rules = graft.core.Robots.parse(
      """User-agent: *
        |Disallow: /private
        |Sitemap: https://h.test/sitemap.xml
        |
        |Sitemap: https://h.test/sitemap-news.xml
        |User-agent: other
        |Allow: /
        |""".stripMargin)
    assert(rules.sitemaps == Seq("https://h.test/sitemap.xml",
      "https://h.test/sitemap-news.xml"))
    assert(rules.groups.size == 2)
    assert(!rules.isAllowed("anybot", "/private/x"))
  }

  test("review pins: null body contributes nothing; '>' inside a quoted " +
      "attribute does not end the tag") {
    import spark.implicits._
    val pages = Seq(
      ("https://n.test/sm.xml", null.asInstanceOf[String]), // failed fetch
      ("https://q.test/sm.xml",
        "<urlset><url data-note=\"a>b\"><loc>https://q.test/p</loc></url>" +
          "<url note='x>y'><loc>/rel</loc></url></urlset>"))
      .toDF("u", "b")
    val rows = Sitemap.entries(pages, "u", "b")
      .select("url").collect().map(_.getString(0)).toSet
    assert(rows == Set("https://q.test/p", "https://q.test/rel"))
  }
}

package graft.serp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SerpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def googleBlock(title: String, url: String, desc: String, withScript: Boolean = false): String =
    s"""<div jscontroller="SC7lYd"><div><a href="$url"><h3>$title</h3></a></div>
       |<div data-sncf="1">${if (withScript) "<script>junk()</script>" else ""}$desc</div></div>""".stripMargin

  test("google SERP parse (Google.ts:201-257 selector contract)") {
    val html = "<html><body>" +
      googleBlock("First Result", "https://a.test/1", "Description one.") +
      googleBlock("Second", "https://b.test/2", "Description two.", withScript = true) +
      """<div jscontroller="SC7lYd"><a href="https://no-title.test"></a><div data-sncf="1">x</div></div>""" +
      googleBlock("No content", "https://c.test/3", "") +
      "</body></html>"
    val rows = GoogleSerp.parse("q1", 1, html)
    assert(rows.map(_.title) == Seq("First Result", "Second"))
    assert(rows.map(_.url) == Seq("https://a.test/1", "https://b.test/2"))
    assert(rows(1).description == "Description two.") // script removed
    assert(rows.map(_.position) == Seq(1, 2))
    assert(rows.forall(_.category == "web"))
  }

  test("searxng JSON parse: web/images/news union (Searxng.ts:100-179)") {
    val json =
      """{"results": [
        |  {"url": "https://w.test", "title": "W", "content": "web result", "engine": "google", "category": "web"},
        |  {"url": "https://i.test", "title": "I", "content": "img", "engine": "bing", "category": "images",
        |   "img_src": "https://i.test/img.png", "resolution": "1000×1500"},
        |  {"url": "https://n.test", "title": "N", "content": "news snippet", "engine": "ddg", "category": "news",
        |   "publishedDate": "2024-01-01", "thumbnail": "https://n.test/t.png"},
        |  {"title": "no url, skipped"}
        |]}""".stripMargin
    val rows = SearxngSerp.parse("q", 1, json)
    assert(rows.length == 3)
    val img = rows.find(_.category == "images").get
    assert(img.imageWidth.contains(1000) && img.imageHeight.contains(1500))
    assert(img.source == "SearXNG (bing)")
    val news = rows.find(_.category == "news").get
    assert(news.date.contains("2024-01-01") && news.imageUrl.contains("https://n.test/t.png"))
    assert(SearxngSerp.parse("q", 1, "not json").isEmpty)
  }

  test("google search URL builder: pagination + locale (Google.ts:72-194)") {
    val u1 = GoogleSerp.buildSearchUrl(GoogleSerp.SearchOptions("spark engine", page = 2, limit = 10,
      lang = Some("de"), country = Some("DE"), timeRange = Some("week"), safeSearch = Some(1)))
    assert(u1.contains("start=10"))
    assert(u1.contains("q=spark+engine"))
    assert(u1.contains("hl=de-DE"))
    assert(u1.contains("lr=lang_de"))
    assert(u1.contains("cr=countryDE"))
    assert(u1.contains("tbs=qdr%3Aw") || u1.contains("tbs=qdr:w"))
    assert(u1.contains("safe=medium"))
    // per-page limit capped at 100 and drives start
    val u2 = GoogleSerp.buildSearchUrl(GoogleSerp.SearchOptions("q", page = 3, limit = 500))
    assert(u2.contains("num=100") && u2.contains("start=200"))
  }

  test("typed Dataset transform over mixed engines") {
    import spark.implicits._
    val pages = Seq(
      SerpTransforms.SerpPage("google", "q", 1,
        "<html><body>" + googleBlock("T", "https://a.test", "d") + "</body></html>"),
      SerpTransforms.SerpPage("searxng", "q", 2,
        """{"results":[{"url":"https://x.test","title":"X","content":"c","engine":"e"}]}""")
    ).toDS()
    val rows = SerpTransforms.parseAll(spark, pages).collect()
    assert(rows.length == 2)
    assert(rows.map(_.page).toSet == Set(1, 2))
  }
  test("AC-Engine JSON parse + direct-limit URL (ACEngine.ts:23-116)") {
    val json = """{"results": [
      {"url": "https://a.test/1", "title": "One", "description": "d1", "category": "web"},
      {"url": "https://a.test/2", "title": "Two", "snippet": "s2"},
      {"title": "NoUrl skipped"},
      {"url": "https://a.test/img", "category": "images", "title": "Img",
       "imageUrl": "https://a.test/i.png", "imageWidth": 640, "imageHeight": 480, "position": 9},
      {"url": "https://a.test/news", "category": "news", "title": "News",
       "snippet": "ns", "date": "2026-01-01"}
    ]}"""
    val rows = AcSerp.parse("q", 1, json)
    assert(rows.map(_.url) == Seq("https://a.test/1", "https://a.test/2",
      "https://a.test/img", "https://a.test/news"))
    assert(rows(1).description == "s2")             // snippet fallback
    assert(rows.forall(_.source == "AC-Engine"))    // default source
    assert(rows(2).position == 9 && rows(2).imageWidth.contains(640))
    assert(rows(3).category == "news" && rows(3).date.contains("2026-01-01"))
    assert(AcSerp.parse("q", 1, "not json").isEmpty)

    val url = AcSerp.buildSearchUrl("http://ac.example.test/",
      GoogleSerp.SearchOptions("cats dogs", offset = 5, limit = 30, lang = Some("de")),
      sources = Some("web,news"))
    assert(url == "http://ac.example.test/search?q=cats+dogs&start=5&limit=30&lang=de&sources=web%2Cnews")

    // typed transform routes by engine name
    val s2 = spark; import s2.implicits._
    val pages = s2.createDataset(Seq(SerpTransforms.SerpPage("ac-engine", "q", 1, json)))
    assert(SerpTransforms.parseAll(spark, pages).collect().length == 4)
  }

}

package graft.api

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.{SerpGen, SiteGen}
import graft.serp.SerpTransforms
import graft.engine.CrawlConfig

class GraftApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val corpus = SiteGen.rows(42L, 60, 3).toSeq
  private lazy val pagesDf = {
    val s = spark; import s.implicits._
    s.createDataset(corpus).toDF()
  }

  test("scrape: corpus point read + full extraction (ScrapeController path)") {
    val url = SiteGen.pageUrl(0, 4)
    val r = Graft.scrape(spark, pagesDf, url)
    val ex = graft.core.Extractor.extract(url, new String(corpus.find(_.url == url).get.html, "UTF-8"))
    assert(r.status == 200 && r.success)
    assert(r.title == ex.title && r.markdown == ex.markdown.getOrElse("") &&
      r.text == ex.text.getOrElse("") && r.links == ex.links)
  }

  test("scrape: missing url -> 404 failure row (Base.ts status classifier)") {
    val r = Graft.scrape(spark, pagesDf, "https://host0.example.test/nope.html")
    assert(r.status == 404 && !r.success && r.markdown.isEmpty)
  }

  test("search: parse + ordered limit + J5 enrichment left join") {
    val s = spark; import s.implicits._
    val serp = s.createDataset(Seq(
      SerpTransforms.SerpPage("google", "q1", 1, SerpGen.googleHtml(7L, 10)),
      SerpTransforms.SerpPage("google", "q1", 2, SerpGen.googleHtml(8L, 10)),
      SerpTransforms.SerpPage("google", "q2", 1, SerpGen.googleHtml(9L, 10))))
    val plain = Graft.search(spark, serp, Graft.SearchRequest("q1", limit = 5))
    val rows = plain.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("page")).toSeq.sorted == rows.map(_.getAs[Int]("page")).toSeq)

    // enrichment joins scraped columns by url (nulls when not in corpus)
    val enriched = Graft.search(spark, serp, Graft.SearchRequest("q1", limit = 5, scrapeResults = true),
      scrapeCorpus = Some(pagesDf))
    assert(enriched.columns.contains("scraped_markdown"))
    assert(enriched.count() == 5)
  }

  test("search: offset + pages bound + ordering preserved after enrichment") {
    val s = spark; import s.implicits._
    val serp = s.createDataset(Seq(
      SerpTransforms.SerpPage("google", "q1", 1, SerpGen.googleHtml(7L, 10)),
      SerpTransforms.SerpPage("google", "q1", 2, SerpGen.googleHtml(8L, 10)),
      SerpTransforms.SerpPage("google", "q1", 3, SerpGen.googleHtml(9L, 10))))
    // pages=2 slices off page 3; offset=2 skips the first two ordered rows
    val all = Graft.search(spark, serp, Graft.SearchRequest("q1", limit = 100, pages = 2)).collect()
    assert(all.map(_.getAs[Int]("page")).max == 2)
    val shifted = Graft.search(spark, serp,
      Graft.SearchRequest("q1", limit = 3, offset = 2, pages = 2)).collect()
    assert(shifted.length == 3)
    assert(shifted.map(r => (r.getAs[Int]("page"), r.getAs[Int]("position"))).toSeq ==
      all.map(r => (r.getAs[Int]("page"), r.getAs[Int]("position"))).slice(2, 5).toSeq)
    // enrichment join does not scramble the (page, position) order
    val enriched = Graft.search(spark, serp,
      Graft.SearchRequest("q1", limit = 6, pages = 2, scrapeResults = true),
      scrapeCorpus = Some(pagesDf)).collect()
    val order = enriched.map(r => (r.getAs[Int]("page"), r.getAs[Int]("position"))).toSeq
    assert(order == order.sorted)
  }

  test("planSearch(request): lang/offset plumbed into the task URLs") {
    val plan = Graft.planSearch(spark,
      Graft.SearchRequest("spark", limit = 10, offset = 3, pages = 2, lang = Some("de")))
      .collect().sortBy(_.getAs[Int]("page"))
    assert(plan.length == 2)
    val u1 = plan(0).getAs[String]("task_url")
    val u2 = plan(1).getAs[String]("task_url")
    // lang=de without country -> first file-order de-* region (de-AT)
    assert(u1.contains("lr=lang_de") && u1.contains("www.google.at") && u1.contains("cr=countryAT"))
    assert(u1.contains("start=3") && u2.contains("start=13")) // offset + (page-1)*perPage
  }

  test("searchTotals: page + scrape task accounting and credits (A5)") {
    val s = spark; import s.implicits._
    // pages 1 and 2 exist in the corpus; page 3 is requested but missing
    val serp = s.createDataset(Seq(
      SerpTransforms.SerpPage("google", "q1", 1, SerpGen.googleHtml(7L, 10)),
      SerpTransforms.SerpPage("google", "q1", 2, SerpGen.googleHtml(8L, 10))))
    val t = Graft.searchTotals(spark, serp,
      Graft.SearchRequest("q1", limit = 6, pages = 3))
    assert(t.totalTasks == 3 && t.completedTasks == 2 && t.failedTasks == 1)
    assert(t.resultCount == 6)
    assert(t.creditsUsed == 3) // pages only, no scrape tasks

    val tScrape = Graft.searchTotals(spark, serp,
      Graft.SearchRequest("q1", limit = 6, pages = 2, scrapeResults = true),
      scrapeCorpus = Some(pagesDf))
    assert(tScrape.totalTasks == 2 + tScrape.resultCount)
    assert(tScrape.creditsUsed == 2 + (tScrape.completedTasks - 2)) // pages + completed scrapes
  }

  test("planSearch: pagination fan-out (W3: start = offset + (page-1)*perPage)") {
    val plan = Graft.planSearch(spark, Seq(
      graft.serp.GoogleSerp.SearchOptions(query = "spark", limit = 25)))
    val rows = plan.collect().sortBy(_.getAs[Int]("page"))
    assert(rows.length == 1) // perPage=25 -> 1 page
    val plan2 = Graft.planSearch(spark, Seq(
      graft.serp.GoogleSerp.SearchOptions(query = "spark", limit = 10, page = 1)))
    assert(plan2.collect().head.getAs[String]("task_url").contains("num=10"))
  }

  test("ad-domain filter (P7): blocks known ad hosts, passes content hosts") {
    assert(CrawlConfig.isAdUrl("https://ads.doubleclick.net/x"))
    assert(CrawlConfig.isAdUrl("https://www.googlesyndication.com/tag.js"))
    assert(!CrawlConfig.isAdUrl("https://host0.example.test/p0.html"))
    val cfg = CrawlConfig(jobId = "j", seeds = Seq("https://a.test/"),
      strategy = "all", filterAdDomains = true)
    assert(!cfg.inScope("https://stats.google-analytics.com/collect"))
    assert(cfg.inScope("https://b.test/page"))
  }
}

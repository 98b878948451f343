package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S2 browser-layer decision fidelity (EngineConfigurator.ts). Expectations
  * hand-traced from the reference; the render itself (JS execution) is the
  * documented capability gap — the pages table carries the rendered DOM. */
class BrowserRenderSpec extends AnyFunSuite {

  import BrowserRender._
  import BrowserRender.PreNav._

  // --------------------------------------------------------- ad interception

  test("shouldBlock is substring containment over the reference table (ts:167)") {
    assert(shouldBlock("https://securepubads.doubleclick.net/gpt.js"))
    assert(shouldBlock("https://www.googletagmanager.com/gtm.js?id=1"))
    // substring semantics: an ad domain ANYWHERE in the URL blocks — looser
    // than P7's registrable-domain filter, faithfully so
    assert(shouldBlock("https://x.example.com/?redir=doubleclick.net"))
    assert(!shouldBlock("https://example.com/ads/banner.png"))
    assert(!shouldBlock("https://google.com/search"))
  }

  test("interceptPlan partitions in order") {
    val (ok, aborted) = interceptPlan(Seq(
      "https://a.com/1", "https://cdn.fbcdn.net/x.js", "https://a.com/2"))
    assert(ok == Seq("https://a.com/1", "https://a.com/2"))
    assert(aborted == Seq("https://cdn.fbcdn.net/x.js"))
  }

  // --------------------------------------------------------------- hook plan

  test("hook order: limitFilter first, browser chain, caller hooks last (ts:60-143,463-465)") {
    assert(hookPlan("playwright", Seq("mine")) == Seq(
      "limitFilter", "viewport", "adBlocking", "requestTimeout",
      "authentication", "preNav", "mine"))
    assert(hookPlan("cheerio", Seq("mine")) == Seq("limitFilter", "mine"))
  }

  // ---------------------------------------------------------------- nav plan

  test("navPlan falsy chain (ts:193-199): 0/empty fall through to defaults") {
    assert(navPlan(None, None) == NavPlan(30000L, "domcontentloaded"))
    assert(navPlan(Some(0L), Some("")) == NavPlan(30000L, "domcontentloaded"))
    assert(navPlan(Some(0L), None, envTimeoutMs = Some(5000L)) ==
      NavPlan(5000L, "domcontentloaded"))
    assert(navPlan(Some(12000L), Some("networkidle")) == NavPlan(12000L, "networkidle"))
  }

  // ------------------------------------------------------------------ preNav

  private def resp(url: String, body: String = "b",
      headers: Seq[(String, String)] = Nil, status: Int = 200) =
    Response(url, "GET", status, headers, body)

  test("rule parsing: invalid regex never matches; unknown type is exact; empty keys dropped (ts:299-313)") {
    assert(!parseRule("regex", "[unclosed").matches("[unclosed"))
    assert(parseRule("whatever", "https://a.com/x").matches("https://a.com/x"))
    assert(parseConfigs(Seq(("", Seq(("exact", "x"))), ("k", Nil))).isEmpty)
  }

  test("regex rules are anchored ^(?:p)$ (ts:306)") {
    val r = parseRule("regex", "https://a\\.com/\\d+")
    assert(r.matches("https://a.com/123"))
    assert(!r.matches("xx https://a.com/123 yy"))
  }

  test("glob rules use minimatch-style full match") {
    val r = parseRule("glob", "https://api.example.com/**")
    assert(r.matches("https://api.example.com/v1/data"))
    assert(!r.matches("https://other.example.com/v1"))
  }

  test("capture: first matching non-empty-body response per key, in arrival order") {
    val cfgs = parseConfigs(Seq(
      ("api", Seq(("glob", "https://api.example.com/**"))),
      ("auth", Seq(("exact", "https://a.com/token")))))
    val out = capture(cfgs, Seq(
      resp("https://static.com/x.css"),
      resp("https://api.example.com/v1/a"),
      resp("https://api.example.com/v1/b"), // api already done — ignored
      resp("https://a.com/token")))
    assert(out.map(c => (c.key, c.url)) == Seq(
      ("api", "https://api.example.com/v1/a"), ("auth", "https://a.com/token")))
  }

  test("capture: empty body skips but leaves the key pending (ts:375-383)") {
    val cfgs = parseConfigs(Seq(("api", Seq(("glob", "https://api.example.com/**")))))
    val out = capture(cfgs, Seq(
      resp("https://api.example.com/v1/a", body = ""),
      resp("https://api.example.com/v1/b")))
    assert(out.map(_.url) == Seq("https://api.example.com/v1/b"))
    // ...unless content-length says there IS a body (reported length path)
    val out2 = capture(cfgs, Seq(
      resp("https://api.example.com/v1/a", body = "",
        headers = Seq(("Content-Length", "42")))))
    assert(out2.map(_.url) == Seq("https://api.example.com/v1/a"))
  }

  test("one response can satisfy multiple keys (no break in the cfg loop, ts:356-439)") {
    val cfgs = parseConfigs(Seq(
      ("k1", Seq(("glob", "https://api.example.com/**"))),
      ("k2", Seq(("exact", "https://api.example.com/v1/a")))))
    val out = capture(cfgs, Seq(resp("https://api.example.com/v1/a")))
    assert(out.map(_.key) == Seq("k1", "k2"))
  }

  test("headers lowercased last-wins; set-cookie carried raw (ts:366-367,396-400)") {
    val cfgs = parseConfigs(Seq(("k", Seq(("exact", "https://a.com/x")))))
    val out = capture(cfgs, Seq(resp("https://a.com/x", headers = Seq(
      ("X-Tag", "one"), ("x-tag", "two"),
      ("Set-Cookie", "a=1"), ("Set-Cookie", "b=2")))))
    assert(out.head.headers("x-tag") == "two")
    assert(out.head.setCookieRaw == Seq("a=1", "b=2"))
  }

  test("sessionDefaults match ts:469-490,524-546") {
    val d = sessionDefaults()
    assert(d.headless && d.retryOnBlocked)
    assert(d.maxRequestRetries == 3 && d.maxSessionRotations == 3)
    assert(d.blockedStatusCodes.isEmpty)
    assert(d.fingerprintBrowser == "chrome" && d.fingerprintMinVersion == 120)
    assert(!sessionDefaults(envHeadless = Some("false")).headless)
  }

  // --------------------------------------------------------------- Spark side

  test("renderPlan: aborted requests produce no response, so an ad-colliding capture target is never captured") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    val docs = spark.range(0, 60).select($"id".cast("long").as("doc_id"))
    val plan = BrowserRender.renderPlan(
      BrowserRender.syntheticResources(spark, docs.toDF()),
      Seq(("api", Seq(("glob", "https://api.example.com/**"))),
        ("asset", Seq(("glob", "https://static.example.com/**")))))
      .collect().sortBy(_.doc_id)
    assert(plan.length == 60)
    plan.foreach { r =>
      assert(r.total_requests == 6 && r.viewport_w == 1920 && r.viewport_h == 1080)
      assert(r.nav_timeout_ms == 30000L && r.wait_until == "domcontentloaded")
      // 6 consecutive residues mod 3 -> exactly two ad slots
      assert(r.blocked_requests == 2)
      val d = r.doc_id
      val apiIsAd = (d + d % 6) % 3 == 0
      val apiEmpty = d % 5 == 4
      val expect =
        (if (!apiIsAd && !apiEmpty) Seq("api") else Nil) ++ Seq("asset")
      assert(r.captured_keys.sorted == expect.sorted, s"doc $d")
    }
  }
}

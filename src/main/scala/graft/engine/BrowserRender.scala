package graft.engine

import graft.core.UrlOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Browser-engine render pipeline (SURVEY §2.1 S2) — the DETERMINISTIC
 * decision layer of the reference's Playwright/Puppeteer engines, modeled
 * offline. Actual JS execution cannot exist in this sandbox; the pages
 * table's `html` column is the already-rendered DOM (the documented
 * capability gap). What the reference's browser layer ADDS around that
 * render is almost entirely pure logic, and all of it ships here:
 *
 *  - [[hookPlan]] — `core/EngineConfigurator.ts:23-55,60-143,463-465`:
 *    `configure()` first installs the browser hook chain
 *    `[viewport, adBlocking, requestTimeout, authentication, preNav]`
 *    ahead of any caller hooks, then `applyCommonHooks` prepends the
 *    `limitFilterHook` for EVERY engine (Cheerio included) — so the
 *    effective order is limit-filter first, caller hooks last.
 *  - [[shouldBlock]] / [[interceptPlan]] — `EngineConfigurator.ts:166-190`:
 *    the browser ad-block route aborts any sub-resource whose URL contains
 *    one of the 13 `AD_DOMAINS` entries (`libs/src/constants.ts:4-18`) as a
 *    SUBSTRING (`url.includes(domain)` — deliberately looser than P7's
 *    registrable-domain link filter: `https://x.com/?r=doubleclick.net`
 *    is aborted here but survives scope filtering). The table is the spec
 *    of this behavior, reproduced as data with citation (same treatment as
 *    GoogleData for F11).
 *  - [[navPlan]] — `EngineConfigurator.ts:193-199`: per-request goto
 *    options; JS `||` falsy semantics mean `timeout: 0` falls through to
 *    the env default and then 30 000 ms, and an empty-string `wait_until`
 *    falls through to `domcontentloaded`.
 *  - [[PreNav]] — `EngineConfigurator.ts:264-461`: the template-driven
 *    response-capture engine. Rules are exact / glob (minimatch, dot:true)
 *    / regex (compiled anchored as `^(?:p)$`; an invalid regex never
 *    matches); keys with no valid rules are dropped; responses are scanned
 *    in arrival order and each not-yet-done key captures the FIRST
 *    matching response with a non-empty body (body text non-empty OR a
 *    parseable positive `content-length` header) — an empty-body match
 *    leaves the key pending for later responses. Headers are lowercased
 *    (first value of any array), `set-cookie` is carried raw, and capture
 *    stops once every key is done.
 *  - [[SessionDefaults]] — `EngineConfigurator.ts:469-490`: headless
 *    unless env opts out, `retryOnBlocked`, `maxRequestRetries` 3,
 *    `maxSessionRotations` 3, `blockedStatusCodes` [] (no status code
 *    triggers rotation — the reference wants those pages captured), and
 *    the chrome-120 fingerprint floor (`:524-546`).
 *  - Viewport 1920×1080 is applied exactly once per page
 *    (`__viewportApplied` latch, `:152-163`) — [[ViewportWidth]]/
 *    [[ViewportHeight]].
 *  - The error-handler classification installed at `:492-521` is C6's
 *    [[ProxySession.classifyError]] — one policy, shared.
 *
 * Spark side: [[renderPlan]] evaluates intercept + preNav + nav budget for
 * a whole pages table in one `mapPartitions` pass over (url, resources),
 * keeping sub-resource logs inside their page row (no explode shuffle);
 * rule sets compile once per partition.
 */
object BrowserRender {

  /** EngineConfigurator.ts:158-160 — enforced browser viewport. */
  val ViewportWidth = 1920
  val ViewportHeight = 1080

  /** EngineConfigurator.ts:477-478. */
  val MaxRequestRetries = 3
  val MaxSessionRotations = 3

  /** libs/src/constants.ts:4-18 — the reference's ad-block list, the spec
    * of shouldBlock's behavior (substring semantics). */
  val AdDomainsRef: IndexedSeq[String] = IndexedSeq(
    "doubleclick.net", "adservice.google.com", "googlesyndication.com",
    "googletagservices.com", "googletagmanager.com", "google-analytics.com",
    "adsystem.com", "adservice.com", "adnxs.com", "ads-twitter.com",
    "facebook.net", "fbcdn.net", "amazon-adsystem.com")

  /** EngineConfigurator.ts:167 — `AD_DOMAINS.some(domain => url.includes(domain))`. */
  def shouldBlock(url: String): Boolean = {
    var i = 0
    while (i < AdDomainsRef.length) {
      if (url.contains(AdDomainsRef(i))) return true
      i += 1
    }
    false
  }

  /** Partition a page's sub-resource request URLs into (continued, aborted)
    * exactly as the route interceptor does, order preserved. */
  def interceptPlan(requests: Seq[String]): (Seq[String], Seq[String]) =
    requests.partition(!shouldBlock(_))

  /** Effective pre-navigation hook order for an engine
    * (EngineConfigurator.ts:60-143 + 463-465). Caller-supplied hooks run
    * LAST; the limit filter runs FIRST for every engine. */
  def hookPlan(engineType: String, existingHooks: Seq[String] = Nil): Seq[String] = {
    val browser = engineType == "playwright" || engineType == "puppeteer"
    val base =
      if (browser)
        Seq("viewport", "adBlocking", "requestTimeout", "authentication", "preNav")
      else Seq.empty
    "limitFilter" +: (base ++ existingHooks)
  }

  /** Resolved per-request goto options (EngineConfigurator.ts:193-199).
    * JS `||` falsy chain: 0 / "" / null all fall through. */
  final case class NavPlan(timeoutMs: Long, waitUntil: String)
  def navPlan(
      optTimeoutMs: Option[Long],
      optWaitUntil: Option[String],
      envTimeoutMs: Option[Long] = None,
      envWaitUntil: Option[String] = None): NavPlan = NavPlan(
    optTimeoutMs.filter(_ != 0L).orElse(envTimeoutMs.filter(_ != 0L)).getOrElse(30000L),
    optWaitUntil.filter(_.nonEmpty).orElse(envWaitUntil.filter(_.nonEmpty))
      .getOrElse("domcontentloaded"))

  // ------------------------------------------------------------ preNav

  object PreNav {
    sealed trait Rule { def matches(url: String): Boolean }
    /** `url === pattern` (EngineConfigurator.ts:328-329). */
    final case class Exact(pattern: String) extends Rule {
      def matches(url: String): Boolean = url == pattern
    }
    /** minimatch(url, pattern, {dot:true}) (ts:330-331); the engine's
      * minimatch-subset translation in UrlOps is the shared glob spec. */
    final case class Glob(pattern: String) extends Rule {
      private val re = UrlOps.compilePattern(pattern)
      def matches(url: String): Boolean = re.matcher(url).matches()
    }
    /** `new RegExp("^(?:" + p + ")$")`; an uncompilable pattern is kept but
      * never matches (ts:304-307, re === undefined). */
    final case class Anchored(pattern: String) extends Rule {
      private val re: Option[java.util.regex.Pattern] =
        try Some(java.util.regex.Pattern.compile("^(?:" + pattern + ")$"))
        catch { case _: Exception => None }
      def matches(url: String): Boolean = re.exists(_.matcher(url).matches())
    }

    /** Parse one template rule (ts:299-313): regex/glob by tag, anything
      * else (including a missing type) is exact. */
    def parseRule(tpe: String, pattern: String): Rule = tpe match {
      case "regex" => Anchored(pattern)
      case "glob" => Glob(pattern)
      case _ => Exact(pattern)
    }

    final case class KeyCfg(key: String, rules: Seq[Rule])

    /** Keys with an empty name or zero rules are dropped (ts:313). */
    def parseConfigs(cfgs: Seq[(String, Seq[(String, String)])]): Seq[KeyCfg] =
      cfgs.map { case (k, rs) => KeyCfg(k, rs.map((parseRule _).tupled)) }
        .filter(k => k.key.nonEmpty && k.rules.nonEmpty)

    /** One observed sub-resource response, in arrival order. Headers as
      * (name, value) pairs — may carry duplicates (set-cookie). */
    final case class Response(
        url: String, method: String, status: Int,
        headers: Seq[(String, String)], body: String)

    /** A captured payload (ts:406-416), headers lowercased first-wins. */
    final case class Captured(
        key: String, url: String, method: String, status: Int,
        headers: Map[String, String], body: String, setCookieRaw: Seq[String])

    /** hasBody (ts:375-383): non-empty text OR parseable positive
      * content-length. */
    private def hasBody(body: String, lowerHeaders: Map[String, String]): Boolean = {
      if (body != null && body.nonEmpty) true
      else {
        val cl = lowerHeaders.get("content-length").map { s =>
          try s.trim.takeWhile(_.isDigit) match { case "" => 0; case d => d.toInt }
          catch { case _: Exception => 0 }
        }.getOrElse(0)
        cl > 0
      }
    }

    /** Run the response listener over an ordered response log
      * (ts:340-451): each response is offered to every not-done key in
      * declared order; a match with an empty body skips capture but leaves
      * the key pending; processing stops when all keys are done. */
    def capture(cfgs: Seq[KeyCfg], responses: Seq[Response]): Seq[Captured] = {
      val done = Array.fill(cfgs.length)(false)
      val out = Seq.newBuilder[Captured]
      val it = responses.iterator
      while (it.hasNext && !done.forall(identity)) {
        val r = it.next()
        var i = 0
        while (i < cfgs.length) {
          val cfg = cfgs(i)
          if (!done(i) && cfg.rules.exists(_.matches(r.url))) {
            // JS object assignment: a later duplicate header overwrites the
            // earlier one (ts:366-367) — last wins
            val lower = r.headers.map { case (k, v) =>
              k.toLowerCase(java.util.Locale.ROOT) -> v
            }.toMap
            if (hasBody(r.body, lower)) {
              val setCookie = r.headers.collect {
                case (k, v) if k.equalsIgnoreCase("set-cookie") => v
              }
              out += Captured(cfg.key, r.url, r.method, r.status, lower,
                if (r.body == null) "" else r.body, setCookie)
              done(i) = true
            }
          }
          i += 1
        }
      }
      out.result()
    }
  }

  // ------------------------------------------------------------ Spark side

  /** One page's render decision log: what the browser layer would have
    * aborted, captured, and waited for around the (already materialized)
    * DOM render. `resources` = ordered sub-resource requests as
    * (url, method, status, contentLength, bodyLen) — body is modeled by
    * length (capture stores lengths, not payloads, at table scale). */
  final case class PageResources(
      url: String, doc_id: Long,
      res_urls: Seq[String], res_status: Seq[Int], res_bodylen: Seq[Int])

  final case class RenderDecision(
      url: String, doc_id: Long,
      viewport_w: Int, viewport_h: Int,
      nav_timeout_ms: Long, wait_until: String,
      total_requests: Int, blocked_requests: Int,
      captured_keys: Seq[String])

  /** Evaluate intercept + preNav + nav budget for a pages table in one
    * partition-local pass — resource logs never leave their page row, rule
    * sets compile once per partition, and the output is a flat columnar
    * frame Catalyst can prune. */
  def renderPlan(
      pages: Dataset[PageResources],
      preNavCfgs: Seq[(String, Seq[(String, String)])],
      optTimeoutMs: Option[Long] = None,
      optWaitUntil: Option[String] = None): Dataset[RenderDecision] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val nav = navPlan(optTimeoutMs, optWaitUntil)
    val cfgsB = spark.sparkContext.broadcast(preNavCfgs)
    pages.mapPartitions { it =>
      val cfgs = PreNav.parseConfigs(cfgsB.value)
      it.map { p =>
        val (_, aborted) = interceptPlan(p.res_urls)
        val survivors = p.res_urls.indices.filter(i => !shouldBlock(p.res_urls(i)))
        val responses = survivors.map { i =>
          PreNav.Response(p.res_urls(i), "GET", p.res_status(i), Nil,
            "x" * math.max(0, p.res_bodylen(i)))
        }
        val captured = PreNav.capture(cfgs, responses)
        RenderDecision(p.url, p.doc_id, ViewportWidth, ViewportHeight,
          nav.timeoutMs, nav.waitUntil,
          p.res_urls.length, aborted.length, captured.map(_.key))
      }
    }
  }

  /** Deterministic synthetic sub-resource log, closed-form in `doc_id` so a
    * SQL oracle can recompute every decision without running the model:
    * page d has 6 requests; request i is an ad URL iff (d + i) % 3 == 0
    * (cycling through the reference table), an API capture target iff
    * i == (d % 6) (url `https://api.example.com/v1/data?page=d`), else a
    * static asset; status 200, body length d % 5 == 4 && i == d % 6 ? 0 : 100
    * (so every 5th page's capture target is an empty body and captures
    * nothing). */
  def syntheticResources(spark: SparkSession, docs: DataFrame): Dataset[PageResources] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { d =>
      val res = (0 until 6).map { i =>
        if ((d + i) % 3 == 0)
          "https://cdn." + AdDomainsRef(((d + i) / 3 % AdDomainsRef.length).toInt) + "/t.js"
        else if (i == (d % 6).toInt) s"https://api.example.com/v1/data?page=$d"
        else s"https://static.example.com/a/$i.css"
      }
      val bodylen = (0 until 6).map { i =>
        if (d % 5 == 4 && i == (d % 6).toInt) 0 else 100
      }
      PageResources(s"https://example.com/p/$d", d, res, res.map(_ => 200), bodylen)
    }
  }

  /** EngineConfigurator.ts:469-490,524-546 as data. */
  final case class SessionDefaults(
      headless: Boolean, retryOnBlocked: Boolean, maxRequestRetries: Int,
      maxSessionRotations: Int, blockedStatusCodes: Seq[Int],
      fingerprintBrowser: String, fingerprintMinVersion: Int)
  def sessionDefaults(envHeadless: Option[String] = None): SessionDefaults =
    SessionDefaults(!envHeadless.contains("false"), retryOnBlocked = true,
      MaxRequestRetries, MaxSessionRotations, Nil, "chrome", 120)
}

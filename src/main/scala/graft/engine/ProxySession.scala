package graft.engine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Proxy selection + session rotation + retry/timeout classification
 * (SURVEY §2.8 C5/C6) — the DECISION machinery of the reference's egress
 * layer, modeled deterministically. No live proxies or sockets exist in
 * this sandbox; what ships here is every rule the reference applies to
 * decide *which* egress identity a request uses and *whether* a failure is
 * retried — the parts that are pure logic:
 *
 *  - [[TieredConfig]] / [[selectTiered]] — `managers/Proxy.ts:274-327`
 *    (`_handleTieredUrl`): a rule-matched URL merges its proxy with the
 *    flattened tier list and rotates over the combined list; a call with
 *    neither request nor tier rotates over the flattened list; an explicit
 *    tier rotates within that tier; an invalid tier falls back to the
 *    per-domain predicted tier (Crawlee's `predictProxyTier`, initial 0 for
 *    an unseen domain — the fallback path `HttpClient.ts:74-78` exercises).
 *  - [[attemptPlan]] — `HttpClient.ts:59-123`: attempt i uses tier i-1
 *    ("stepping tiers like browser engines"), retries+1 total attempts,
 *    got-level retries disabled so each attempt gets a fresh proxy.
 *  - [[SequentialSelector]] — the reference's mutable `nextCustomUrlIndex`
 *    counter + session-sticky custom-URL map (Crawlee
 *    `_handleCustomUrl`), single-threaded semantics.
 *  - Determinism note: the reference's rotation counter advances in
 *    request-PROCESSING order, which under Crawlee's concurrency (50) is
 *    scheduling-dependent — two runs of the reference assign different
 *    proxies to the same URL. The Spark-native re-expression pins the
 *    counter to the engine's canonical sequence number:
 *    `rotation index = seq * attempts + (attempt-1)`. Sequential
 *    processing in canonical order reproduces it exactly
 *    ([[SequentialSelector]] equivalence is spec-asserted), and it is
 *    reproducible across any executor count — a strengthening the
 *    reference itself cannot make, not a divergence.
 *  - [[SessionPoolModel]] — Crawlee session pool as configured by
 *    `core/EngineConfigurator.ts:480-490` (maxSessionRotations 3,
 *    blockedStatusCodes []): usage-counted, error-scored sessions retired
 *    at thresholds; acquisition pinned to lowest-id usable (Crawlee
 *    random-picks — same pinning rationale as above).
 *  - [[classifyError]] — `EngineConfigurator.ts:492-521`: ONLY the five
 *    temporary proxy error codes retry (with session rotation); a crawl
 *    limit signal neither retries nor fails; everything else fails fast.
 *    [[httpRetryDecision]] — the HttpClient loop retries ANY error until
 *    attempts are exhausted (`HttpClient.ts:113-121`); both policies exist
 *    in the reference and both are modeled.
 *  - [[timedOut]] — C5: request timeout 20 s default (`HttpClient.ts:44`),
 *    nav 30 s / handler 600 s (`EngineConfigurator.ts:193-199`,
 *    `Base.ts:463`). Offline, elapsed time comes from a synthetic latency
 *    column; the classification (latency > budget => 'timeout' error fed
 *    to the retry policy) is the real decision path.
 */
object ProxySession {

  /** HttpClient.ts:44 — got request timeout. */
  val HttpTimeoutMsDefault = 20000L
  /** EngineConfigurator.ts:193-199 — browser navigation timeout. */
  val NavTimeoutMsDefault = 30000L
  /** Base.ts:463 — request handler budget. */
  val HandlerTimeoutMsDefault = 600000L

  final case class TieredConfig(
      tiers: IndexedSeq[IndexedSeq[String]],
      rules: Seq[ProxyRouter.ProxyRule] = Nil,
      customUrls: IndexedSeq[String] = IndexedSeq.empty) extends Serializable {
    @transient lazy val compiledRules = new ProxyRouter.Rules(rules)
    /** `this.tieredProxyUrls.flat().filter(Boolean)` (Proxy.ts:282,295). */
    val flat: IndexedSeq[String] = tiers.flatten.filter(_ != null)
  }

  final case class Selected(proxy: Option[String], tier: Option[Int])

  /**
   * `_handleTieredUrl` (Proxy.ts:274-327) with the rotation counter passed
   * in as `rotIdx`. `tierState` carries the per-domain predicted tier for
   * the invalid-tier fallback (empty map = all domains fresh = tier 0).
   */
  def selectTiered(cfg: TieredConfig, rotIdx: Long, requestUrl: Option[String],
      proxyTier: Option[Int], tierState: Map[String, Int] = Map.empty): Selected = {
    // rule match merges [matched, ...flattened] and rotates (Proxy.ts:279-292)
    requestUrl.flatMap(u => cfg.compiledRules.proxyFor(u)) match {
      case Some(matched) =>
        val combined = matched +: cfg.flat
        return Selected(pick(combined, rotIdx), None)
      case None =>
    }
    // neither request nor tier: flat rotation (Proxy.ts:294-303)
    if (requestUrl.isEmpty && proxyTier.isEmpty)
      return Selected(pick(cfg.flat, rotIdx), None)
    // explicit or predicted tier (Proxy.ts:305-327)
    val predicted = proxyTier.getOrElse(predictTier(requestUrl, tierState))
    if (predicted >= 0 && predicted < cfg.tiers.length)
      Selected(pick(cfg.tiers(predicted), rotIdx), Some(predicted))
    else {
      // invalid tier throws (Proxy.ts:312-314); HttpClient catches and
      // re-asks without a tier -> per-domain prediction (HttpClient.ts:74-78)
      val p = predictTier(requestUrl, tierState)
      val t = if (p >= 0 && p < cfg.tiers.length) p else 0
      if (cfg.tiers.isEmpty) Selected(None, None)
      else Selected(pick(cfg.tiers(t), rotIdx), Some(t))
    }
  }

  private def pick(urls: IndexedSeq[String], rotIdx: Long): Option[String] =
    if (urls.isEmpty) None
    else Some(urls(((rotIdx % urls.length) + urls.length).toInt % urls.length))

  /** Crawlee `predictProxyTier`: per-domain history, tier 0 when unseen. */
  private def predictTier(requestUrl: Option[String], tierState: Map[String, Int]): Int =
    requestUrl.map(graft.core.UrlOps.host).filter(_.nonEmpty)
      .flatMap(tierState.get).getOrElse(0)

  final case class Attempt(attempt: Int, tier: Option[Int], proxy: Option[String])

  /**
   * The HttpClient retry loop's proxy schedule (HttpClient.ts:59-79):
   * `retries + 1` attempts, attempt i asking for tier i-1; rotation index
   * for (seq, attempt) is `seq * attempts + (attempt-1)` (see the
   * determinism note above).
   */
  def attemptPlan(cfg: TieredConfig, seq: Long, url: String, retries: Int = 2,
      tierState: Map[String, Int] = Map.empty): Seq[Attempt] = {
    val total = math.max(1, retries + 1)
    (1 to total).map { i =>
      val s = selectTiered(cfg, seq * total + (i - 1), Some(url), Some(i - 1), tierState)
      Attempt(i, s.tier, s.proxy)
    }
  }

  /** Parsed proxy identity (Proxy.ts:255-266): URL credentials decoded. */
  final case class ProxyInfo(sessionId: Option[String], url: String,
      username: String, password: String, hostname: String, port: Int)

  def parseProxyInfo(sessionId: Option[String], url: String): Option[ProxyInfo] = {
    try {
      val u = new java.net.URI(url)
      if (u.getHost == null) return None
      val (user, pass) = Option(u.getUserInfo) match {
        case Some(ui) =>
          val i = ui.indexOf(':')
          if (i >= 0) (ui.substring(0, i), ui.substring(i + 1)) else (ui, "")
        case None => ("", "")
      }
      def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
      Some(ProxyInfo(sessionId, url, dec(user), dec(pass), u.getHost,
        if (u.getPort >= 0) u.getPort else -1))
    } catch { case _: Exception => None }
  }

  /**
   * The reference's single-threaded selector: mutable rotation counter
   * (`nextCustomUrlIndex`, Proxy.ts:284,296,316) and Crawlee's
   * session-sticky custom-URL map. Exists to spec-assert that the pure
   * (seq-keyed) formulation reproduces sequential processing exactly.
   */
  final class SequentialSelector(cfg: TieredConfig) {
    private var nextCustomUrlIndex = 0L
    private val sessionMap = scala.collection.mutable.LinkedHashMap[String, String]()

    def newUrl(sessionId: Option[String] = None, requestUrl: Option[String] = None,
        proxyTier: Option[Int] = None, tierState: Map[String, Int] = Map.empty): Selected = {
      if (cfg.tiers.nonEmpty) {
        val s = selectTiered(cfg, nextCustomUrlIndex, requestUrl, proxyTier, tierState)
        if (s.proxy.isDefined) nextCustomUrlIndex += 1
        s
      } else customUrl(sessionId)
    }

    /** Crawlee `_handleCustomUrl`: a session sticks to the proxy it was
      * first assigned; sessionless calls round-robin. */
    private def customUrl(sessionId: Option[String]): Selected = {
      if (cfg.customUrls.isEmpty) return Selected(None, None)
      sessionId match {
        case Some(sid) =>
          val url = sessionMap.getOrElseUpdate(sid, {
            val u = cfg.customUrls((nextCustomUrlIndex % cfg.customUrls.length).toInt)
            nextCustomUrlIndex += 1
            u
          })
          Selected(Some(url), None)
        case None =>
          val u = cfg.customUrls((nextCustomUrlIndex % cfg.customUrls.length).toInt)
          nextCustomUrlIndex += 1
          Selected(Some(u), None)
      }
    }
  }

  // ------------------------------------------------------------ sessions

  /**
   * Crawlee session pool as the reference configures it
   * (EngineConfigurator.ts:477-490): sessions accrue usage per acquisition
   * and error score per block; a session retires when usageCount reaches
   * `maxUsageCount` or errorScore reaches `maxErrorScore`; good responses
   * decay the score by 0.5. Acquisition is pinned to the lowest-numbered
   * usable session (deterministic stand-in for Crawlee's random pick);
   * a fresh session is created when none is usable and the pool has room,
   * else the oldest retired slot is recycled (rotation).
   */
  final class SessionPoolModel(maxPoolSize: Int = 1000, maxUsageCount: Int = 50,
      maxErrorScore: Double = 3.0) {
    final case class Sess(id: Int, var usage: Int = 0, var errorScore: Double = 0.0) {
      def usable: Boolean = usage < maxUsageCount && errorScore < maxErrorScore
    }
    private val sessions = scala.collection.mutable.ArrayBuffer[Sess]()
    private var nextId = 0
    var rotations = 0

    def acquire(): Sess = {
      sessions.find(_.usable) match {
        case Some(s) => s.usage += 1; s
        case None =>
          if (sessions.nonEmpty) rotations += 1
          if (sessions.length >= maxPoolSize) sessions.remove(0)
          val s = Sess(nextId); nextId += 1; s.usage = 1
          sessions += s
          s
      }
    }
    def markBlocked(s: Sess): Unit = s.errorScore += 1.0
    def markGood(s: Sess): Unit = s.errorScore = math.max(0.0, s.errorScore - 0.5)
    def poolSize: Int = sessions.length
  }

  // ------------------------------------------------- failure classification

  sealed trait RetryDecision
  case object RetryWithRotation extends RetryDecision
  case object NoRetry extends RetryDecision
  case object IgnoreLimitReached extends RetryDecision

  /** EngineConfigurator.ts:504-511 — the exact five temporary codes. */
  val TemporaryProxyErrors: Seq[String] = Seq(
    "ERR_PROXY_CONNECTION_FAILED",
    "ERR_TUNNEL_CONNECTION_FAILED",
    "ERR_PROXY_AUTH_FAILED",
    "ERR_NEED_TO_RETRY",
    "ERR_SOCKS_CONNECTION_FAILED")

  /** The browser-engine errorHandler (EngineConfigurator.ts:492-521). */
  def classifyError(message: String, isLimitReached: Boolean = false): RetryDecision =
    if (isLimitReached) IgnoreLimitReached
    else if (TemporaryProxyErrors.exists(message.contains)) RetryWithRotation
    else NoRetry

  /** The HttpClient loop (HttpClient.ts:113-121): any error retries while
    * attempts remain; exhaustion surfaces HTTP_REQUEST_ERROR. */
  def httpRetryDecision(attempt: Int, totalAttempts: Int): RetryDecision =
    if (attempt < totalAttempts) RetryWithRotation else NoRetry

  /** C5: the timeout decision over a synthetic latency column. */
  def timedOut(latencyMs: Long, budgetMs: Long = HttpTimeoutMsDefault): Boolean =
    latencyMs > budgetMs

  // ------------------------------------------------------------ Spark shape

  /** The attempt plan as a column: for each (url, seq) row an
    * `array<struct<attempt,tier,proxy>>` computed executor-side against a
    * broadcast config — the scheduling dimension shape of P10/J3 (no
    * shuffle, no driver round-trip). */
  def attemptPlanColumn(spark: SparkSession, cfg: TieredConfig, retries: Int = 2)
      : (Column, Column) => Column = {
    val b = spark.sparkContext.broadcast(cfg)
    val f = udf((url: String, seq: Long) =>
      attemptPlan(b.value, seq, url, retries).map(a =>
        (a.attempt, a.tier.map(Integer.valueOf).orNull, a.proxy.orNull)))
    (urlCol: Column, seqCol: Column) => f(urlCol, seqCol)
  }
}

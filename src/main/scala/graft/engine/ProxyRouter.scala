package graft.engine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/**
 * Proxy-rule URL router (SURVEY §2.2 P10): the reference's config-driven
 * proxy selection (`managers/Proxy.ts:274-327, 499-565`) as a broadcast rule
 * list + column transform. No live proxies exist in this sandbox (C6 is a
 * declared non-goal), but the ROUTING decision — which proxy label a URL
 * would use — is pure logic, modeled here so schedulers can partition or
 * rate-limit by egress identity.
 *
 * Faithful semantics (findProxyForUrl): rules are scanned IN ORDER; within
 * one rule the match forms have priority `url` (exact) > `pattern` (full-URL
 * wildcard) > `domain` (hostname wildcard); the first rule that matches any
 * of its forms wins. Wildcards: `*` -> `.*`, `?` -> `.`, everything else
 * regex-escaped, case-insensitive, anchored (Proxy.ts:499-523). Invalid
 * URLs (no parseable host) never match domain rules.
 */
object ProxyRouter {

  final case class ProxyRule(
      url: Option[String] = None,
      domain: Option[String] = None,
      pattern: Option[String] = None,
      proxy: String)

  /** Compiled rule set — build once on the driver, ship via broadcast. */
  final class Rules(rules: Seq[ProxyRule]) extends Serializable {
    private val compiled: Array[(Option[String], Option[java.util.regex.Pattern],
        Option[java.util.regex.Pattern], String)] =
      rules.map { r =>
        (r.url, r.pattern.map(compileWildcard), r.domain.map(compileWildcard), r.proxy)
      }.toArray

    /** findProxyForUrl (Proxy.ts:530-563). */
    def proxyFor(requestUrl: String): Option[String] = {
      val host = graft.core.UrlOps.host(requestUrl)
      var i = 0
      while (i < compiled.length) {
        val (exact, pattern, domain, proxy) = compiled(i)
        if (exact.contains(requestUrl)) return Some(proxy)
        if (pattern.exists(_.matcher(requestUrl).matches())) return Some(proxy)
        if (host.nonEmpty && domain.exists(_.matcher(host).matches())) return Some(proxy)
        i += 1
      }
      None
    }
  }

  /** `*` -> `.*`, `?` -> `.`, rest escaped; case-insensitive, anchored
    * (Proxy.ts:499-523). */
  def compileWildcard(p: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    p.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()^$|+".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    java.util.regex.Pattern.compile("^" + sb + "$",
      java.util.regex.Pattern.CASE_INSENSITIVE)
  }

  /** Parse the reference's proxy.config JSON shape `{rules:[{url|domain|
    * pattern, proxy}]}` (Proxy.ts:370-399 example). */
  def parseConfig(json: String): Seq[ProxyRule] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = try JsonMethods.parse(json) catch { case _: Exception => return Nil }
    parsed \ "rules" match {
      case JArray(items) =>
        items.flatMap { item =>
          def str(k: String): Option[String] = item \ k match {
            case JString(v) if v.nonEmpty => Some(v); case _ => None
          }
          str("proxy").map(p => ProxyRule(str("url"), str("domain"), str("pattern"), p))
        }
      case _ => Nil
    }
  }

  /** The routing decision as a column: `proxy(url)` — null when no rule
    * matches (caller falls back to the default pool, Proxy.ts:281-292). The
    * rule list rides a broadcast; matching is executor-side, no shuffle. */
  def proxyColumn(spark: SparkSession, rules: Seq[ProxyRule]): Column => Column = {
    val b = spark.sparkContext.broadcast(new Rules(rules))
    val f = udf((url: String) => b.value.proxyFor(url))
    (urlCol: Column) => f(urlCol)
  }
}

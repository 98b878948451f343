package graft.core

/**
 * robots.txt parser + matcher (Google REP, RFC 9309 subset).
 *
 * The reference has NO robots handling (grep over /root/reference: zero
 * hits) — politeness is delegated to Crawlee's session pool. The north rule
 * requires robots as an explicit broadcast dimension, so this is a
 * from-scratch implementation: user-agent groups, Allow/Disallow with
 * longest-match-wins (Allow wins ties), `*` wildcards and `$` anchors,
 * Crawl-delay.
 *
 * Parsed rules are tiny (a few KB/host) — the `robots(host, rules)` table is
 * broadcast and joined against the frontier (SURVEY §2.3 J3), never shuffled.
 */
object Robots {

  final case class Rule(allow: Boolean, pattern: String) {
    // compiled lazily per rule; patterns are tiny
    @transient private lazy val re: java.util.regex.Pattern = compile(pattern)
    def matches(path: String): Boolean = re.matcher(path).lookingAt()
    private def compile(p: String): java.util.regex.Pattern = {
      val sb = new StringBuilder("^")
      p.foreach {
        case '*' => sb.append(".*")
        case '$' => sb.append("$")
        case c if "\\.[]{}()+-^?|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      java.util.regex.Pattern.compile(sb.toString)
    }
  }

  final case class Group(agents: Seq[String], rules: Seq[Rule], crawlDelay: Option[Double])

  final case class RobotRules(groups: Seq[Group],
      sitemaps: Seq[String] = Nil) {
    /** Pick the most specific matching group for `agent` (longest UA token
      * match; `*` group as fallback), per RFC 9309 §2.2.1. */
    def groupFor(agent: String): Option[Group] = {
      val la = agent.toLowerCase
      val candidates = groups.flatMap { g =>
        g.agents.collect {
          case a if a == "*" => (0, g)
          case a if la.contains(a.toLowerCase) => (a.length, g)
        }
      }
      if (candidates.isEmpty) None else Some(candidates.maxBy(_._1)._2)
    }

    /** Longest-match-wins; Allow wins ties; no match => allowed. */
    def isAllowed(agent: String, path: String): Boolean = groupFor(agent) match {
      case None => true
      case Some(g) =>
        val p = if (path.isEmpty) "/" else path
        val matching = g.rules.filter(r => r.pattern.nonEmpty && r.matches(p))
        if (matching.isEmpty) true
        else {
          val best = matching.maxBy(r => (r.pattern.length, r.allow))
          best.allow
        }
    }

    def crawlDelay(agent: String): Option[Double] = groupFor(agent).flatMap(_.crawlDelay)
  }

  val empty: RobotRules = RobotRules(Nil)

  def parse(body: String): RobotRules = {
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    val sitemaps = scala.collection.mutable.ArrayBuffer[String]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[Rule]()
    var delay: Option[Double] = None
    var inGroupBody = false

    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[Rule]()
      delay = None
    }

    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              if (inGroupBody) { flush(); inGroupBody = false }
              agents += value
            case "allow" =>
              inGroupBody = true
              if (value.nonEmpty) rules += Rule(allow = true, value)
            case "disallow" =>
              inGroupBody = true
              if (value.nonEmpty) rules += Rule(allow = false, value)
              // empty Disallow = allow all (no rule)
            case "crawl-delay" =>
              inGroupBody = true
              delay = scala.util.Try(value.toDouble).toOption
            case "sitemap" =>
              // collected globally (group-independent per sitemaps.org);
              // still continues the group body like any non-UA line
              inGroupBody = true
              if (value.nonEmpty) sitemaps += value
            case _ => inGroupBody = true // unknown directive — group continues
          }
        }
      }
    }
    flush()
    RobotRules(groups.toSeq, sitemaps.toSeq)
  }

  /** Convenience: is `url` fetchable for `agent` under `rules`? */
  def allowedUrl(rules: RobotRules, agent: String, url: String): Boolean = {
    val parts = UrlOps.parse(url)
    val path = parts.map(p => p.path + p.query.map("?" + _).getOrElse("")).getOrElse("/")
    rules.isAllowed(agent, if (path.isEmpty) "/" else path)
  }
}

package graft.core

/**
 * Pure URL algebra for the crawl engine: parsing, RFC-3986 reference
 * resolution, and crawl-dedup normalization.
 *
 * Semantics derived from the reference (AnyCrawl):
 *  - resolve: `packages/scrape/src/core/transformers/HTMLTransformer.ts:366-384`
 *    (`http:/x` -> `http://x` scheme repair, WHATWG `new URL(rel, base)`
 *    resolution, return-input-on-failure).
 *  - normalize (uniqueKey): Crawlee `Request.computeUniqueKey` semantics
 *    (public knowledge), used at `packages/scrape/src/engines/Base.ts:392-400`:
 *    lowercase scheme+host, strip fragment, drop `utm_*` params, sort the
 *    remaining query params, trim whitespace.
 *
 * Everything here is a total, deterministic function — unit/property tested
 * (idempotence, resolve totality) so it is safe inside executor-side codegen
 * paths and dedup keys at 10^10-URL scale.
 */
object UrlOps {

  /** Parsed URL parts. `authority` includes userinfo/host/port verbatim. */
  final case class Parts(
      scheme: Option[String],
      authority: Option[String],
      path: String,
      query: Option[String],
      fragment: Option[String]
  ) {
    def render: String = {
      val sb = new StringBuilder
      scheme.foreach(s => sb.append(s).append(':'))
      authority.foreach(a => sb.append("//").append(a))
      sb.append(path)
      query.foreach(q => sb.append('?').append(q))
      fragment.foreach(f => sb.append('#').append(f))
      sb.toString
    }
  }

  // RFC 3986 appendix B regex.
  private val UrlRe =
    """^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$""".r

  def parse(url: String): Option[Parts] = url match {
    case UrlRe(scheme, auth, path, query, frag) =>
      Some(Parts(Option(scheme), Option(auth), if (path == null) "" else path, Option(query), Option(frag)))
    case _ => None
  }

  /** Repair `http:/host` / `https:/host` (single-slash scheme), as the
    * reference does before resolution (HTMLTransformer.ts:368-374). */
  def repairScheme(u: String): String = {
    if (u.startsWith("http:/") && !u.startsWith("http://")) "http://" + u.substring(6)
    else if (u.startsWith("https:/") && !u.startsWith("https://")) "https://" + u.substring(7)
    else u
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSegment(out) }
      else if (in == "/..") { in = "/"; trimLastSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def trimLastSegment(sb: StringBuilder): Unit = {
    val idx = sb.lastIndexOf("/")
    if (idx >= 0) sb.setLength(idx) else sb.setLength(0)
  }

  /**
   * Resolve a (possibly relative, possibly malformed) URL reference against a
   * base. Mirrors the reference's `resolveUrl` (WHATWG-equivalent for the
   * fixture domain): scheme repair first, RFC 3986 §5.2 merge, dot-segment
   * removal, and *returns the input unchanged* when resolution is impossible.
   */
  def resolve(base: String, ref: String): String =
    resolveOpt(base, ref).getOrElse(ref)

  /** WHATWG special schemes (the subset a web crawl meets). */
  private val specialSchemes: Set[String] = Set("http", "https", "ws", "wss", "ftp")

  /**
   * WHATWG-faithful resolution; `None` mirrors `new URL(ref, base)` throwing
   * (reference then returns the input, HTMLTransformer.ts:379-383; Crawlee's
   * enqueueLinks skips the link instead). Special-scheme nuances covered:
   *  - `http://` (empty host) is invalid -> None;
   *  - `https:host/p` with a same-scheme base enters the WHATWG *relative
   *    state* (resolves like a relative path);
   *  - with a different-scheme base the slashes are implied
   *    (`http:foo/p` -> `http://foo/p`).
   */
  def resolveOpt(base: String, ref: String): Option[String] = {
    val r = repairScheme(ref.trim)
    (parse(base.trim), parse(r)) match {
      case (Some(b), Some(p0)) if b.scheme.isDefined =>
        val bScheme = b.scheme.map(_.toLowerCase)
        p0.scheme.map(_.toLowerCase) match {
          case Some(s) if specialSchemes.contains(s) =>
            p0.authority match {
              case Some(a) if a.isEmpty => None // new URL throws on empty host
              case Some(_) => Some(merge(b, p0))
              case None =>
                if (bScheme.contains(s)) {
                  // same scheme, no "//": WHATWG relative state
                  Some(merge(b, p0.copy(scheme = None)))
                } else {
                  // special authority ignore-slashes: first segment is the host
                  val path = p0.path
                  val slash = path.indexOf('/')
                  val (auth, rest) =
                    if (slash < 0) (path, "") else (path.substring(0, slash), path.substring(slash))
                  if (auth.isEmpty) None
                  else Some(merge(b, p0.copy(authority = Some(auth), path = rest)))
                }
            }
          case _ => Some(merge(b, p0))
        }
      case _ => None
    }
  }

  /** RFC 3986 §5.2 reference merge + WHATWG empty-path serialization. */
  private def merge(b: Parts, p: Parts): String = {
    val resolved =
      if (p.scheme.isDefined) p.copy(path = removeDotSegments(p.path))
      else if (p.authority.isDefined) p.copy(scheme = b.scheme, path = removeDotSegments(p.path))
      else if (p.path.isEmpty) {
        val q = if (p.query.isDefined) p.query else b.query
        Parts(b.scheme, b.authority, b.path, q, p.fragment)
      } else if (p.path.startsWith("/"))
        Parts(b.scheme, b.authority, removeDotSegments(p.path), p.query, p.fragment)
      else {
        val merged =
          if (b.authority.isDefined && b.path.isEmpty) "/" + p.path
          else {
            val i = b.path.lastIndexOf('/')
            (if (i >= 0) b.path.substring(0, i + 1) else "") + p.path
          }
        Parts(b.scheme, b.authority, removeDotSegments(merged), p.query, p.fragment)
      }
    // WHATWG: an authority with an empty path serializes with "/".
    val norm =
      if (resolved.authority.isDefined && resolved.path.isEmpty) resolved.copy(path = "/")
      else resolved
    norm.render
  }

  /** Lowercased host (no port, no userinfo); empty string when absent. */
  def host(url: String): String =
    parse(url.trim).flatMap(_.authority).map { a =>
      val noUser = a.substring(a.indexOf('@') + 1)
      val h = noUser.lastIndexOf(':') match {
        // IPv6 literals keep their brackets; only strip a trailing :port.
        case i if i > noUser.lastIndexOf(']') && i >= 0 => noUser.substring(0, i)
        case _ => noUser
      }
      h.toLowerCase
    }.getOrElse("")

  /** scheme://host[:explicit-non-default-port] */
  def origin(url: String): String = parse(url.trim) match {
    case Some(p) if p.scheme.isDefined && p.authority.isDefined =>
      val sch = p.scheme.get.toLowerCase
      val h = host(url)
      val port = portOf(p.authority.get).filterNot(pt => isDefaultPort(sch, pt)).map(":" + _).getOrElse("")
      s"$sch://$h$port"
    case _ => ""
  }

  private def portOf(auth: String): Option[String] = {
    val noUser = auth.substring(auth.indexOf('@') + 1)
    val i = noUser.lastIndexOf(':')
    if (i > noUser.lastIndexOf(']') && i >= 0 && i < noUser.length - 1) Some(noUser.substring(i + 1)) else None
  }

  private def isDefaultPort(scheme: String, port: String): Boolean =
    (scheme == "http" && port == "80") || (scheme == "https" && port == "443")

  /** eTLD+1 of the host of `url` ("same-domain" crawl-strategy key), via
    * the full PSL algorithm over [[Psl.snapshot]] (wildcards, exceptions,
    * private registries — see Psl's class doc). A bare single-label host
    * (or IP) is returned as-is. */
  def registrableDomain(url: String): String = Psl.snapshot.registrable(host(url))

  /**
   * Crawl-dedup normalization (Crawlee `computeUniqueKey` semantics):
   * trim; lowercase scheme + host; strip fragment; drop `utm_*` query params;
   * sort remaining params by (name, value); drop an empty query; keep path
   * bytes as-is. Idempotent (property-tested).
   */
  def normalize(url: String): String = parse(url.trim) match {
    case Some(p) if p.scheme.isDefined =>
      val scheme = p.scheme.map(_.toLowerCase)
      val auth = p.authority.map { a =>
        val at = a.indexOf('@')
        val (user, hostPort) = if (at >= 0) (a.substring(0, at + 1), a.substring(at + 1)) else ("", a)
        val lower = hostPort.toLowerCase
        // strip default ports
        val stripped = scheme match {
          case Some("http") if lower.endsWith(":80")  => lower.dropRight(3)
          case Some("https") if lower.endsWith(":443") => lower.dropRight(4)
          case _ => lower
        }
        user + stripped
      }
      val query = p.query.flatMap { q =>
        val kept = q.split('&').toSeq.filter(_.nonEmpty)
          .filterNot(_.toLowerCase.startsWith("utm_"))
          .sorted
        if (kept.isEmpty) None else Some(kept.mkString("&"))
      }
      val path = if (auth.isDefined && p.path.isEmpty) "/" else p.path
      Parts(scheme, auth, path, query, None).render
    case _ => url.trim
  }

  /** Per-job dedup key, `"{jobId}-{normalize(url)}"` (Base.ts:400). */
  def uniqueKey(jobId: String, url: String): String = s"$jobId-${normalize(url)}"

  /**
   * SURT (Sort-friendly URI Reordering Transform) key — the canonical CDX
   * ordering key of web-archive indexes (the public Heritrix/OpenWayback/
   * pywb convention): canonicalize via [[normalize]] (lowercase scheme+host,
   * sorted query, fragment dropped, default port stripped), then drop the
   * scheme and userinfo, strip one leading `www`/`www2`/… label, reverse the
   * host labels joined with commas, keep an explicit port as `:port`, and
   * append `)` + path (+ `?query`). The whole key is lowercased so captures
   * of one page differing only in path case sort adjacently; same-domain
   * captures become one contiguous key range — the property that lets a
   * 100 TB index prune partitions by domain prefix.
   *
   * `com,example)/a/b?x=1` for `https://www.Example.com/a/b?x=1`.
   */
  def surt(url: String): String = {
    val n = normalize(url)
    parse(n) match {
      case Some(p) if p.authority.exists(_.nonEmpty) =>
        val h = host(n)
        val bare =
          if (h.matches("www\\d*\\..+")) h.substring(h.indexOf('.') + 1) else h
        // IPv6 literals and bare IPs are not label-reversible — keep as-is
        val rev =
          if (bare.startsWith("[") || bare.forall(c => c.isDigit || c == '.')) bare
          else bare.split('.').reverse.mkString(",")
        val port = portOf(p.authority.get).map(":" + _).getOrElse("")
        val path = if (p.path.isEmpty) "/" else p.path
        (rev + port + ")" + path + p.query.map("?" + _).getOrElse("")).toLowerCase
      case _ => n.toLowerCase
    }
  }

  /**
   * Glob -> anchored regex, minimatch-style subset used by the reference's
   * include/exclude paths (Base.ts:327-353): `**` crosses `/`, `*` and `?`
   * do not. A `/body/flags` literal is compiled as a (non-anchored) regex,
   * mirroring Base.ts:331-344.
   */
  def compilePattern(pattern: String): java.util.regex.Pattern = {
    val lit = """^/(.*)/([gimsuy]*)$""".r
    pattern match {
      case lit(body, flags) =>
        try {
          var f = 0
          if (flags.contains('i')) f |= java.util.regex.Pattern.CASE_INSENSITIVE
          if (flags.contains('s')) f |= java.util.regex.Pattern.DOTALL
          if (flags.contains('m')) f |= java.util.regex.Pattern.MULTILINE
          java.util.regex.Pattern.compile(body, f)
        } catch { case _: Exception => globToRegex(pattern) }
      case _ => globToRegex(pattern)
    }
  }

  private def globToRegex(glob: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if i + 1 < glob.length && glob.charAt(i + 1) == '*' => sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case c if "\\.[]{}()+-^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('$')
    java.util.regex.Pattern.compile(sb.toString)
  }

  /** True if `url` matches any compiled pattern (regex literals use find(),
    * globs use full match — minimatch semantics). */
  def matchesAny(url: String, patterns: Seq[java.util.regex.Pattern], rawPatterns: Seq[String]): Boolean =
    patterns.zip(rawPatterns).exists { case (p, raw) =>
      if (raw.startsWith("/")) p.matcher(url).find() else p.matcher(url).matches()
    }
}

package graft.core

/**
 * Public-Suffix-List matcher — the full publicsuffix.org algorithm
 * (exact, wildcard `*.` and exception `!` rules; longest match wins;
 * exception beats everything; prevailing default rule `*`), over a
 * pluggable rule set. The reference keys its "same-domain" crawl scope and
 * its ad-domain blocklist on hostnames (`packages/scrape/src/engines/
 * Base.ts:327-353`, domain endsWith checks); a web-scale crawler needs the
 * REGISTRABLE domain (eTLD+1) instead — `a.blogspot.com` and
 * `b.blogspot.com` are different sites, while `news.bbc.co.uk` and
 * `www.bbc.co.uk` are the same one — for scope decisions, per-site
 * politeness grouping, and domain-reputation aggregation (q52).
 *
 * The embedded [[Psl.snapshot]] is a deliberately small, documented SUBSET
 * of the public list (the ~50 multi-label ICANN suffixes a web crawl hits
 * most, the spec's own `*.ck`/`!www.ck` example pair, and the major
 * site-per-subdomain private registries). Production swaps in the full
 * ~10k-line list via [[Psl.apply]] — the matcher is rule-count-agnostic
 * and the parsed form is a few hash sets, broadcast-friendly at any size.
 *
 * Matching is pure per-row compute (no I/O, no regex): one lowercase pass
 * plus at most `labels` hash probes — safe inside a codegen'd UDF or a
 * `mapPartitions` kernel at 10^10-row scale.
 */
final class Psl private (
    exact: Set[String], wildcard: Set[String], exception: Set[String]) {

  /** Number of labels in the public suffix of `host` (>=1; the default
    * rule `*` makes every bare TLD its own suffix). `host` must already be
    * lowercase without a trailing dot (UrlOps.host output is). */
  private def publicSuffixLen(labels: Array[String]): Int = {
    val n = labels.length
    var best = 1 // prevailing rule "*"
    var k = 1
    var suffix = labels(n - 1)
    // grow the candidate tail one label at a time; set probes are O(1)
    while (k <= n) {
      // !rule: suffix is one label shorter. Clamped at 1: spec-conforming
      // PSL data has no 1-label exception rules, but a custom rule set
      // containing one ("!foo") must not yield an empty public suffix —
      // the prevailing-"*" floor (every bare TLD is its own suffix) wins.
      if (exception.contains(suffix)) return math.max(1, k - 1)
      if (exact.contains(suffix) && k > best) best = k
      // "*.ck" matches any 2-label tail ending in ck: tail-minus-head in wildcard
      if (k >= 2) {
        val tailMinusHead = suffix.substring(suffix.indexOf('.') + 1)
        if (wildcard.contains(tailMinusHead) && k > best) best = k
      }
      k += 1
      if (k <= n) suffix = labels(n - k) + "." + suffix
    }
    best
  }

  /** The public suffix of `host` ("co.uk" for "news.bbc.co.uk"). A host
    * that IS a public suffix returns itself. */
  def publicSuffix(host: String): String = {
    val h = host.toLowerCase
    if (h.isEmpty || isIpOrBracket(h)) return h
    val labels = h.split('.')
    labels.takeRight(math.min(publicSuffixLen(labels), labels.length)).mkString(".")
  }

  /** eTLD+1 of `host`. A host that is itself a public suffix (or a bare
    * single label / IP) is returned as-is — the caller's grouping key
    * stays total. */
  def registrable(host: String): String = {
    val h = host.toLowerCase
    if (h.isEmpty || isIpOrBracket(h)) return h
    val labels = h.split('.')
    if (labels.length <= 1) return h
    val ps = publicSuffixLen(labels)
    labels.takeRight(math.min(ps + 1, labels.length)).mkString(".")
  }

  private def isIpOrBracket(h: String): Boolean =
    h.startsWith("[") || h.forall(c => c.isDigit || c == '.')
}

object Psl {

  /** Parse PSL-format lines: `//` comments and blank lines skipped,
    * `*.`-prefixed rules are wildcards, `!`-prefixed are exceptions,
    * anything else exact. Section markers (ICANN/PRIVATE) are comments. */
  def apply(lines: Seq[String]): Psl = {
    val ex = Set.newBuilder[String]
    val wc = Set.newBuilder[String]
    val xc = Set.newBuilder[String]
    lines.iterator.map(_.trim.toLowerCase).foreach { l =>
      if (l.nonEmpty && !l.startsWith("//")) {
        if (l.startsWith("!")) xc += l.substring(1)
        else if (l.startsWith("*.")) wc += l.substring(2)
        else if (l != "*") ex += l
      }
    }
    new Psl(ex.result(), wc.result(), xc.result())
  }

  /** Embedded snapshot (subset — see class doc). Sources: the ICANN
    * multi-label suffixes previously hard-coded in UrlOps (kept for
    * behavioral continuity), the publicsuffix.org spec's `*.ck` example,
    * and the large site-per-subdomain private registries. */
  val snapshotLines: Seq[String] = Seq(
    // ICANN multi-label (subset)
    "co.uk", "org.uk", "gov.uk", "ac.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.kr", "or.kr", "go.kr", "co.nz", "org.nz", "net.nz",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.za", "org.za", "com.my", "co.id", "or.id",
    // the spec's wildcard + exception example (Cook Islands)
    "*.ck", "!www.ck",
    // PRIVATE section (site-per-subdomain registries)
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "pages.dev", "workers.dev",
    "wordpress.com", "s3.amazonaws.com", "cloudfront.net"
  )

  /** The default matcher over [[snapshotLines]]. */
  val snapshot: Psl = apply(snapshotLines)
}

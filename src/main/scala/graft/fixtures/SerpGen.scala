package graft.fixtures

/**
 * Deterministic Google-SERP-shaped HTML fixture generator for the SERP
 * parsing pipeline (structure mirrors the selector contract of the
 * reference's Google parser, `packages/search/src/engines/Google.ts:201-257`:
 * result blocks `div[jscontroller="SC7lYd"]`, `a > h3` titles, description in
 * `div[data-sncf="1"]`).
 */
object SerpGen {

  private val words = Vector("alpha", "beta", "gamma", "delta", "search",
    "result", "engine", "index", "crawl", "rank", "query", "snippet")

  private def w(h: Long, k: Int): String =
    words((((SiteGen.mix(h, k.toLong)) % words.size + words.size) % words.size).toInt)

  /** One SERP page with `n` result blocks; every 5th block is malformed
    * (missing description) and must be skipped by the parser (P9 guard). */
  def googleHtml(seed: Long, n: Int): String = {
    val sb = new StringBuilder("<html><body><div id=\"search\">")
    var i = 0
    while (i < n) {
      val h = SiteGen.mix(seed, i.toLong)
      val title = s"${w(h, 1).capitalize} ${w(h, 2)} ${w(h, 3)}"
      val url = s"https://${w(h, 4)}.example.org/${w(h, 5)}/$i"
      val desc = if (i % 5 == 4) "" else s"${w(h, 6)} ${w(h, 7)} ${w(h, 8)} ${w(h, 9)}."
      sb.append(s"""<div jscontroller="SC7lYd" class="g">""")
      sb.append(s"""<a href="$url"><h3>$title</h3></a>""")
      if (desc.nonEmpty)
        sb.append(s"""<div data-sncf="1">$desc<script>noise()</script></div>""")
      sb.append("</div>")
      i += 1
    }
    sb.append("</div></body></html>")
    sb.toString
  }
}

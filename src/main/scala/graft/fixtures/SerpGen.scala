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

  /** SERP fixture with CLOSED-FORM fields (every emitted title/url/desc is a
    * simple string function of `(i, k)`), so a SQL oracle can regenerate the
    * parser's expected output without running it. Parser guards exercised:
    * a decoy block without `h3` (skipped, position not advanced), every 5th
    * block missing its description (skipped), and `<script>` noise inside
    * kept descriptions (stripped). Kept block k emits position k+1 for k<4
    * and k for k>4. */
  def closedFormGoogleHtml(i: Long, n: Int): String = {
    val sb = new StringBuilder("<html><body><div id=\"search\">")
    sb.append("""<div jscontroller="SC7lYd" class="g"><a href="https://decoy.example.org/">no title here</a></div>""")
    var k = 0
    while (k < n) {
      sb.append("""<div jscontroller="SC7lYd" class="g">""")
      sb.append(s"""<a href="https://site$k.example.org/doc$i"><h3>Title $i $k</h3></a>""")
      if (k % 5 != 4)
        sb.append(s"""<div data-sncf="1">Description $i $k.<script>noise()</script></div>""")
      sb.append("</div>")
      k += 1
    }
    sb.append("</div></body></html>")
    sb.toString
  }
}

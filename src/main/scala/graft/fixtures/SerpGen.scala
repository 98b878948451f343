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

  /** SearXNG JSON response with CLOSED-FORM fields (every value a string
    * function of `(i, k)`), so a SQL oracle regenerates the parser's
    * expected rows without running it. Guards exercised: item k=2 has no
    * url (skipped; positions renumber over kept items), category defaults
    * to web when absent (k=0), engine defaults to unknown (i%3==0),
    * content→snippet description fallback (odd k), image resolution in
    * both `640×480` and `800 x 600` spellings plus the absent case, news
    * publishedDate→pubdate fallback, news thumbnail→imageUrl. */
  def closedFormSearxngJson(i: Long): String = {
    val items = (0 until 6).flatMap { k =>
      if (k == 2) Some("""{"title":"T %d 2","content":"C %d 2"}""".format(i, i))
      else {
        val sb = new StringBuilder("{")
        sb.append(s""""url":"https://s$k.example.org/d$i","title":"T $i $k"""")
        if (k % 3 == 1) sb.append(""","category":"images"""")
        else if (k % 3 == 2) sb.append(""","category":"news"""")
        else if (k == 3) sb.append(""","category":"web"""")
        if (i % 3 != 0) sb.append(s""","engine":"e${i % 3}"""")
        if (k % 2 == 0) sb.append(s""","content":"C $i $k"""")
        else sb.append(s""","snippet":"S $i $k"""")
        if (k % 3 == 1) {
          sb.append(s""","img_src":"https://im.example.org/$i/$k"""")
          if (i % 2 == 0) sb.append(""","resolution":"640×480"""")
          else if (k == 4) sb.append(""","resolution":"800 x 600"""")
        }
        if (k % 3 == 2) {
          sb.append(s""","thumbnail":"https://th.example.org/$i"""")
          if (i % 2 == 0) sb.append(""","publishedDate":"2024-01-02"""")
          else sb.append(""","pubdate":"2023-12-31"""")
        }
        sb.append("}")
        Some(sb.toString)
      }
    }
    s"""{"results":[${items.mkString(",")}]}"""
  }

  /** AC-Engine JSON response, closed-form like [[closedFormSearxngJson]].
    * Guards exercised: item k=1 has no url (skipped; the ordinal fallback
    * renumbers), explicit `position` only on even k (odd k falls back to
    * the 1-based ordinal over kept items), source defaults to AC-Engine
    * (odd i), description→snippet fallback (odd k), image fields only when
    * i is even, news date only when i is even. */
  def closedFormAcJson(i: Long): String = {
    val items = (0 until 6).flatMap { k =>
      if (k == 1) Some("""{"title":"T %d 1","description":"D %d 1"}""".format(i, i))
      else {
        val sb = new StringBuilder("{")
        sb.append(s""""url":"https://a$k.example.org/d$i","title":"T $i $k"""")
        if (k % 3 == 1) sb.append(""","category":"images"""")
        else if (k % 3 == 2) sb.append(""","category":"news"""")
        else if (k == 3) sb.append(""","category":"web"""")
        if (k % 2 == 0) sb.append(s""","position":${50 + k}""")
        if (i % 2 == 0) sb.append(s""","source":"src$i"""")
        if (k % 2 == 0) sb.append(s""","description":"D $i $k"""")
        sb.append(s""","snippet":"S $i $k"""")
        if (k % 3 == 1 && i % 2 == 0) {
          sb.append(s""","imageUrl":"https://im.example.org/$i/$k"""")
          sb.append(""","imageWidth":320,"imageHeight":240""")
        }
        if (k % 3 == 2 && i % 2 == 0) sb.append(""","date":"2024-02-03"""")
        sb.append("}")
        Some(sb.toString)
      }
    }
    s"""{"results":[${items.mkString(",")}]}"""
  }
}

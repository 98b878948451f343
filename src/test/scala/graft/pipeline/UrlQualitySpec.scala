package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class UrlQualitySpec extends AnyFunSuite {

  test("clean editorial URL: soft signals only") {
    val s = UrlQuality.score("https://news.site7.com/articles/politics/story7")
    assert(s == UrlQuality.UrlScore(3, 1, 0, 0, 0, false, 30 + 2))
  }

  test("blocklist hit dominates and blocks") {
    val s = UrlQuality.score("https://win-casino-3.bet/free-spins")
    assert(s.badwordHits == 1 && s.blocked)
    assert(s.pathDepth == 1 && s.hyphens == 3 && s.hostDigits == 1)
    assert(s.score == 1000 + 10 + 15 + 2)
    // multiple distinct words each count once
    val m = UrlQuality.score("https://xxx-casino.test/")
    assert(m.badwordHits == 2 && m.score >= 2000)
  }

  test("digit-heavy host, query params, deep paths, fragments") {
    val s = UrlQuality.score("https://a1b2c39.xyz/p?a=1&b=2&c=3")
    assert(s.hostDigits == 4 && s.queryParams == 3 && s.pathDepth == 1)
    assert(!s.blocked && s.score == 10 + 8 + 3)
    val deep = UrlQuality.score("https://shop.site1.com/p/x/y/z/deep/path/item1")
    assert(deep.pathDepth == 7 && deep.score == 70 + 2)
    // fragment never counts as path or query
    val frag = UrlQuality.score("https://h.test/one#a-b?c=1")
    assert(frag.pathDepth == 1 && frag.queryParams == 0 && frag.hyphens == 0)
  }

  test("word-level matching: embedded substrings do not trip the hard gate") {
    // blocklist words hidden inside longer tokens are NOT hits
    assert(!UrlQuality.score("https://essexxx.example.org/").blocked)
    assert(!UrlQuality.score("https://sexpo.org/expo-hall").blocked)
    assert(!UrlQuality.score("https://my.test/ids/abcviagraxyz").blocked)
    // but delimiter-separated whole tokens are, on every URL part
    assert(UrlQuality.score("https://ads.test/serve?kw=viagra").blocked)
    assert(UrlQuality.score("https://x.test/tag/porn/index").blocked)
    assert(UrlQuality.score("https://porn.test/").blocked)
    // underscores delimit too
    assert(UrlQuality.score("https://h.test/a_casino_b").blocked)
  }

  test("case-insensitive matching; custom blocklist; degenerate inputs") {
    assert(UrlQuality.score("https://XXX-Movies0.com/").blocked)
    assert(!UrlQuality.score("https://fine.test/x", badwords = Seq("zzz")).blocked)
    assert(UrlQuality.score("", badwords = Nil) ==
      UrlQuality.UrlScore(0, 0, 0, 0, 0, false, 0L))
    assert(UrlQuality.score("not a url").score == 0L)
  }
}

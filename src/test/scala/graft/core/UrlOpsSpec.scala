package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class UrlOpsSpec extends AnyFunSuite {
  /** deterministic property loop (no scalatestplus bridge in the offline cache) */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("resolve: absolute ref passes through (with dot-segment removal)") {
    assert(UrlOps.resolve("https://a.test/x", "https://b.test/y/../z") == "https://b.test/z")
  }

  test("resolve: relative path") {
    assert(UrlOps.resolve("https://a.test/dir/page.html", "other.html") == "https://a.test/dir/other.html")
    assert(UrlOps.resolve("https://a.test/dir/page.html", "../up.html") == "https://a.test/up.html")
    assert(UrlOps.resolve("https://a.test/dir/sub/", "../../x") == "https://a.test/x")
  }

  test("resolve: root-relative, query-only, fragment-only, empty") {
    assert(UrlOps.resolve("https://a.test/dir/page?q=1#f", "/abs") == "https://a.test/abs")
    assert(UrlOps.resolve("https://a.test/dir/page?q=1", "?x=2") == "https://a.test/dir/page?x=2")
    assert(UrlOps.resolve("https://a.test/dir/page?q=1", "#frag") == "https://a.test/dir/page?q=1#frag")
    assert(UrlOps.resolve("https://a.test/dir/page?q=1#f", "") == "https://a.test/dir/page?q=1")
  }

  test("resolve: protocol-relative and authority-only") {
    assert(UrlOps.resolve("https://a.test/p", "//b.test/q") == "https://b.test/q")
    assert(UrlOps.resolve("https://a.test/p", "//b.test") == "https://b.test/")
  }

  test("resolve: malformed scheme repair (HTMLTransformer.ts:368-374)") {
    assert(UrlOps.resolve("https://a.test/", "http:/example.com/x") == "http://example.com/x")
    assert(UrlOps.resolve("https://a.test/", "https:/example.com") == "https://example.com/")
  }

  test("resolve: unresolvable returns input (HTMLTransformer.ts:379-383)") {
    assert(UrlOps.resolve("not a url", "rel/path") == "rel/path")
  }

  test("normalize: lowercases scheme+host, strips fragment/default port, sorts query, drops utm_*") {
    assert(UrlOps.normalize("HTTPS://Example.COM:443/Path?b=2&a=1&utm_source=x#frag")
      == "https://example.com/Path?a=1&b=2")
    assert(UrlOps.normalize("http://h.test:80/p?") == "http://h.test/p")
    assert(UrlOps.normalize("http://h.test") == "http://h.test/")
  }

  test("normalize: idempotent on generated urls") {
    val gen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "HtTpS")
      host <- Gen.oneOf("A.Test", "www.Example.COM", "host7.example.test")
      path <- Gen.oneOf("", "/", "/a/b", "/Page%20X", "/p/../q")
      q <- Gen.oneOf("", "?z=1&a=2", "?utm_campaign=c&b=1", "?")
      f <- Gen.oneOf("", "#x", "#")
    } yield s"$scheme://$host$path$q$f"
    forAllSeeded(gen) { u =>
      assert(UrlOps.normalize(UrlOps.normalize(u)) == UrlOps.normalize(u))
    }
  }

  test("resolve is total on arbitrary strings") {
    val g = for { a <- Gen.asciiPrintableStr; b <- Gen.asciiPrintableStr } yield (a, b)
    forAllSeeded(g) { case (base, ref) =>
      assert(UrlOps.resolve(base, ref) != null)
    }
  }

  test("host / origin / registrableDomain") {
    assert(UrlOps.host("https://Sub.Host7.Example.TEST:8443/p") == "sub.host7.example.test")
    assert(UrlOps.origin("https://h.test:8443/p?x") == "https://h.test:8443")
    assert(UrlOps.origin("https://h.test:443/p") == "https://h.test")
    assert(UrlOps.registrableDomain("https://a.b.host7.example.test/") == "example.test")
    assert(UrlOps.registrableDomain("https://news.bbc.co.uk/x") == "bbc.co.uk")
    assert(UrlOps.registrableDomain("https://localhost/") == "localhost")
  }

  test("glob and regex-literal patterns (Base.ts:327-353)") {
    val globs = Seq("https://a.test/blog/**")
    val pats = globs.map(UrlOps.compilePattern)
    assert(UrlOps.matchesAny("https://a.test/blog/x/y", pats, globs))
    assert(!UrlOps.matchesAny("https://a.test/shop/x", pats, globs))

    val res = Seq("/\\/product\\/\\d+/")
    val rpats = res.map(UrlOps.compilePattern)
    assert(UrlOps.matchesAny("https://a.test/product/42", rpats, res))
    assert(!UrlOps.matchesAny("https://a.test/product/none", rpats, res))

    val single = Seq("https://a.test/*/page")
    val spats = single.map(UrlOps.compilePattern)
    assert(UrlOps.matchesAny("https://a.test/x/page", spats, single))
    assert(!UrlOps.matchesAny("https://a.test/x/y/page", spats, single))
  }

  test("uniqueKey is jobId-prefixed (Base.ts:392-400)") {
    assert(UrlOps.uniqueKey("job1", "HTTP://A.test/#f") == "job1-http://a.test/")
  }
}

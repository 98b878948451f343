package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** publicsuffix.org algorithm over the embedded snapshot + custom lists.
  * The wildcard/exception cases mirror the spec's own `*.ck` example. */
class PslSpec extends AnyFunSuite {

  test("default rule: unknown TLD is a 1-label suffix") {
    assert(Psl.snapshot.publicSuffix("a.b.example.com") == "com")
    assert(Psl.snapshot.registrable("a.b.example.com") == "example.com")
    assert(Psl.snapshot.registrable("deep.chain.of.labels.site9.org") == "site9.org")
    assert(Psl.snapshot.registrable("host3.example.test") == "example.test")
  }

  test("exact multi-label ICANN suffixes") {
    assert(Psl.snapshot.publicSuffix("news.bbc.co.uk") == "co.uk")
    assert(Psl.snapshot.registrable("news.bbc.co.uk") == "bbc.co.uk")
    assert(Psl.snapshot.registrable("bbc.co.uk") == "bbc.co.uk")
    // a host that IS a public suffix comes back unchanged
    assert(Psl.snapshot.registrable("co.uk") == "co.uk")
    assert(Psl.snapshot.registrable("x.y.z.co.jp") == "z.co.jp")
  }

  test("wildcard rule *.ck") {
    assert(Psl.snapshot.publicSuffix("example.ck") == "example.ck")
    assert(Psl.snapshot.registrable("example.ck") == "example.ck") // is a suffix
    assert(Psl.snapshot.registrable("www.example.ck") == "www.example.ck")
    assert(Psl.snapshot.registrable("a.b.www.example.ck") == "www.example.ck")
  }

  test("exception rule !www.ck beats the wildcard") {
    assert(Psl.snapshot.publicSuffix("www.ck") == "ck")
    assert(Psl.snapshot.registrable("www.ck") == "www.ck")
    assert(Psl.snapshot.registrable("sub.www.ck") == "www.ck")
  }

  test("private registries: one site per subdomain") {
    assert(Psl.snapshot.registrable("user1.github.io") == "user1.github.io")
    assert(Psl.snapshot.registrable("cdn.user1.github.io") == "user1.github.io")
    assert(Psl.snapshot.registrable("shop.blogspot.com") == "shop.blogspot.com")
    assert(Psl.snapshot.registrable("cdn.bucket7.s3.amazonaws.com")
      == "bucket7.s3.amazonaws.com")
    // amazonaws.com itself is NOT in the list -> default 1-label suffix
    assert(Psl.snapshot.registrable("amazonaws.com") == "amazonaws.com")
  }

  test("IPs, brackets, single labels, case") {
    assert(Psl.snapshot.registrable("203.0.113.7") == "203.0.113.7")
    assert(Psl.snapshot.registrable("[2001:db8::1]") == "[2001:db8::1]")
    assert(Psl.snapshot.registrable("localhost") == "localhost")
    assert(Psl.snapshot.registrable("News.BBC.CO.UK") == "bbc.co.uk")
    assert(Psl.snapshot.registrable("") == "")
  }

  test("custom list parse: comments, wildcards, exceptions") {
    val p = Psl(Seq(
      "// comment", "", "foo.bar", "*.baz", "!keep.baz", "  qux  ", "*"))
    assert(p.publicSuffix("a.foo.bar") == "foo.bar")
    assert(p.registrable("x.foo.bar") == "x.foo.bar")
    assert(p.registrable("a.b.foo.bar") == "b.foo.bar")
    assert(p.registrable("x.any.baz") == "x.any.baz")
    assert(p.registrable("sub.keep.baz") == "keep.baz")
    assert(p.registrable("deep.q.qux") == "q.qux")
  }

  test("degenerate 1-label exception rule clamps to a 1-label suffix") {
    // "!foo" is non-spec-conforming (real PSL data has no 1-label
    // exceptions); it must degrade to the prevailing-"*" behavior, not an
    // empty public suffix / bare-label registrable
    val p = Psl(Seq("!foo", "*"))
    assert(p.publicSuffix("foo") == "foo")
    assert(p.publicSuffix("a.foo") == "foo")
    assert(p.registrable("a.foo") == "a.foo")
    assert(p.registrable("b.a.foo") == "a.foo")
  }

  test("properties on generated hosts: suffix chain + idempotence") {
    val rnd = new scala.util.Random(7)
    val labels = Seq("a", "bb", "www", "cdn", "shop", "x1")
    val tails = Seq("com", "co.uk", "ck", "www.ck", "github.io", "test",
      "blogspot.com", "example.org", "s3.amazonaws.com")
    (1 to 500).foreach { _ =>
      val depth = rnd.nextInt(4)
      val host = ((0 until depth).map(_ => labels(rnd.nextInt(labels.size))) :+
        tails(rnd.nextInt(tails.size))).mkString(".")
      val ps = Psl.snapshot.publicSuffix(host)
      val rd = Psl.snapshot.registrable(host)
      assert(host == ps || host.endsWith("." + ps), s"$host publicSuffix $ps")
      assert(host == rd || host.endsWith("." + rd), s"$host registrable $rd")
      assert(rd == ps || rd.endsWith("." + ps), s"$rd must end with suffix $ps")
      // registrable has at most one label more than the suffix
      assert(rd.count(_ == '.') <= ps.count(_ == '.') + 1, s"$host -> $rd / $ps")
      // idempotence: collapsing an already-collapsed domain is a no-op
      assert(Psl.snapshot.registrable(rd) == rd, s"idempotence on $rd")
    }
  }

  test("UrlOps.registrableDomain delegates (URL in, domain out)") {
    assert(UrlOps.registrableDomain("https://News.BBC.co.uk:443/x?y#z") == "bbc.co.uk")
    assert(UrlOps.registrableDomain("https://a.b.host7.example.test/") == "example.test")
    assert(UrlOps.registrableDomain("https://u2.github.io/p") == "u2.github.io")
  }
}

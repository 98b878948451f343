package graft.frontier

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class FilterSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("cuckoo: no false negatives for inserted keys") {
    val cf = CuckooFilter.forCapacity(10000)
    val keys = (0 until 8000).map(i => s"job-https://h$i.test/p$i.html")
    keys.foreach(k => assert(cf.put(k), s"insert failed at $k"))
    keys.foreach(k => assert(cf.mightContain(k), s"false negative for $k"))
  }

  test("cuckoo: fpp stays near design point on absent keys") {
    val cf = CuckooFilter.forCapacity(10000)
    (0 until 8000).foreach(i => cf.put(s"present-$i"))
    val fps = (0 until 20000).count(i => cf.mightContain(s"absent-$i"))
    val fpp = fps / 20000.0
    assert(fpp < 0.02, s"fpp $fpp too high for 12-bit fingerprints")
  }

  test("cuckoo: delete removes and re-permits (re-crawl TTL path)") {
    val cf = CuckooFilter.forCapacity(1000)
    val k = "job-https://host.test/expired.html"
    assert(cf.put(k))
    assert(cf.mightContain(k))
    assert(cf.delete(k))
    assert(!cf.mightContain(k) || cf.mightContain(k) == false)
    // re-insert after expiry works
    assert(cf.put(k) && cf.mightContain(k))
  }

  test("cuckoo: serialization round-trip preserves membership + size") {
    val cf = CuckooFilter.forCapacity(2000)
    val keys = (0 until 1500).map(i => s"k$i")
    keys.foreach(cf.put)
    val back = CuckooFilter.deserialize(cf.serialized)
    assert(back.size == cf.size)
    keys.foreach(k => assert(back.mightContain(k)))
  }

  test("cuckoo: merge preserves both sides' keys (shard-merge path)") {
    val a = CuckooFilter.forCapacity(4000)
    val b = CuckooFilter.forCapacity(4000)
    (0 until 1000).foreach(i => a.put(s"a$i"))
    (0 until 1000).foreach(i => b.put(s"b$i"))
    assert(a.mergeFrom(b))
    (0 until 1000).foreach(i => assert(a.mightContain(s"a$i") && a.mightContain(s"b$i")))
  }

  test("cuckoo: deterministic across instances (no wall-clock, no Random)") {
    def build(): CuckooFilter = {
      val cf = CuckooFilter.forCapacity(5000)
      (0 until 4000).foreach(i => cf.put(s"url-$i"))
      cf
    }
    assert(java.util.Arrays.equals(build().serialized, build().serialized))
  }

  test("cuckoo: victim cache keeps residents on overload (Fan et al. construction)") {
    val cf = new CuckooFilter(16, 8) // 64 slots: saturates fast
    val inserted = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    var full = false
    while (!full && i < 1000) {
      val k = s"key-$i"
      if (cf.put(k)) inserted += k else full = true
      i += 1
    }
    assert(full) // the filter did saturate
    // every successfully-inserted key is still reported present: the
    // homeless fingerprint of the failed kick chain went to the victim
    // slot instead of silently dropping a resident
    inserted.foreach(k => assert(cf.mightContain(k), s"lost $k"))
    // serialization round-trips the victim slot and the "CUKF" tag
    val back = CuckooFilter.deserialize(cf.serialized)
    inserted.foreach(k => assert(back.mightContain(k)))
    assert(back.size == cf.size)
    // and bloom bytes are refused (distinct framing)
    val bloomBytes = new SeenBloom(2, 100L, 0.01).serialized
    assertThrows[IllegalArgumentException](CuckooFilter.deserialize(bloomBytes))
  }

  test("template render: raw/query/path/host filters (urlTemplate.ts:1-103)") {
    import graft.core.UrlTemplate
    val vars = Map("q" -> "best cafés & bars", "host" -> "My-Site.EXAMPLE.com!", "p" -> "a b/c")
    // query = encodeURIComponent semantics: space -> %20, not '+'
    assert(UrlTemplate.render("https://{{host|host}}/search?q={{q|query}}", vars) ==
      "https://my-site.example.com/search?q=best%20caf%C3%A9s%20%26%20bars")
    // path restores '/' after encoding (urlTemplate.ts:38)
    assert(UrlTemplate.render("/{{p|path}}", vars) == "/a%20b/c")
    assert(UrlTemplate.render("{{q}}", vars) == "best cafés & bars")      // raw default
    // missing variable keeps the placeholder verbatim (urlTemplate.ts:70-73)
    assert(UrlTemplate.render("{{missing}}-x", vars) == "{{missing}}-x")
    // unknown filter -> regex does not match -> placeholder untouched
    assert(UrlTemplate.render("{{q|bogus}}", vars) == "{{q|bogus}}")
    // \{{ escapes a literal {{
    assert(UrlTemplate.render("""\{{q}} = {{q}}""", vars) == "{{q}} = best cafés & bars")
    // renderText: filters inert
    assert(UrlTemplate.renderText("{{q|query}}", vars) == "best cafés & bars")
  }

  test("property: template render is total on arbitrary inputs") {
    forAllSeeded(Gen.zip(Gen.asciiPrintableStr, Gen.asciiPrintableStr)) { case (tpl, v) =>
      // never throws, always returns a string
      val out = graft.core.UrlTemplate.render(tpl, Map("v" -> v))
      assert(out != null)
    }
  }
}

package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.core.UrlOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CdxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("cdx-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rec(i: Int): Array[Byte] = {
    val one = new ByteArrayOutputStream()
    Warc.writeResponse(one, s"https://www.h$i.example.test/P$i?b=2&a=1",
      java.time.Instant.ofEpochSecond(1700000000L + i), 200 + i,
      s"<html>page $i</html>".getBytes("UTF-8"))
    one.toByteArray
  }

  // ------------------------------------------------------------------ SURT

  test("surt: scheme dropped, www-stripped, labels reversed, query sorted") {
    assert(UrlOps.surt("https://www.Example.com/a/B?x=2&a=1#frag") ==
      "com,example)/a/b?a=1&x=2")
    assert(UrlOps.surt("http://sub.dom.example.co.uk/") ==
      "uk,co,example,dom,sub)/")
    // www2-style labels strip; bare 'www' host does not vanish
    assert(UrlOps.surt("https://www2.example.org/p") == "org,example)/p")
    // explicit non-default port kept; default port stripped by normalize
    assert(UrlOps.surt("https://example.com:8443/x") == "com,example:8443)/x")
    assert(UrlOps.surt("https://example.com:443/x") == "com,example)/x")
    // IPs and IPv6 literals are not label-reversed
    assert(UrlOps.surt("http://192.168.0.1/a") == "192.168.0.1)/a")
    // missing path becomes "/"
    assert(UrlOps.surt("https://example.com") == "com,example)/")
  }

  test("surt orders same-domain captures contiguously") {
    val keys = Seq(
      "https://a.example.com/1", "https://other.test/x",
      "https://b.example.com/2", "https://example.com/0"
    ).map(UrlOps.surt).sorted
    val exampleBlock = keys.map(_.startsWith("com,example"))
    // all example.com hosts form one contiguous run under the sort
    assert(exampleBlock.dropWhile(!_).takeWhile(identity).size ==
      exampleBlock.count(identity))
  }

  // ------------------------------------------- plain extents: slice-reparse

  test("plain .warc: extents are exact — slicing [offset, offset+length) " +
       "reparses the record; extents tile the file") {
    val out = new ByteArrayOutputStream()
    (0 until 5).foreach(i => out.write(rec(i)))
    val bytes = out.toByteArray
    val caps = Cdx.captures(new ByteArrayInputStream(bytes)).toSeq
    assert(caps.size == 5)
    assert(caps.head.offset == 0L)
    caps.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset) // contiguous tiling
    }
    assert(caps.last.offset + caps.last.length == bytes.length.toLong)
    caps.zipWithIndex.foreach { case (c, i) =>
      val slice = java.util.Arrays.copyOfRange(
        bytes, c.offset.toInt, (c.offset + c.length).toInt)
      val r = Warc.parse(new ByteArrayInputStream(slice)).toSeq
      assert(r.size == 1)
      assert(r.head.url == s"https://www.h$i.example.test/P$i?b=2&a=1")
      assert(r.head.status == 200 + i)
      assert(c.surt == s"test,example,h$i)/p$i?a=1&b=2")
      // 1700000000 + i = 2023-11-14T22:13:(20+i)Z
      assert(c.ts14 == s"202311142213${20 + i}")
      assert(c.digest ==
        String.format("%032x", new java.math.BigInteger(1,
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"<html>page $i</html>".getBytes("UTF-8")))))
    }
  }

  test("ts14 formats WARC-Date as yyyyMMddHHmmss UTC") {
    val caps = Cdx.captures(new ByteArrayInputStream(rec(0))).toSeq
    // 1700000000 = 2023-11-14T22:13:20Z
    assert(caps.head.ts14 == "20231114221320")
  }

  // ------------------------------------------------ gz extents: member unit

  test(".warc.gz: extents are compressed member ranges — gunzipping the " +
       "slice reparses the record") {
    val out = new ByteArrayOutputStream()
    (0 until 4).foreach(i => out.write(Warc.gzipMember(rec(i))))
    val bytes = out.toByteArray
    val caps = Cdx.captures(new ByteArrayInputStream(bytes)).toSeq
    assert(caps.size == 4)
    assert(caps.head.offset == 0L)
    caps.sliding(2).foreach { case Seq(a, b) =>
      assert(a.offset + a.length == b.offset)
    }
    assert(caps.last.offset + caps.last.length == bytes.length.toLong)
    caps.zipWithIndex.foreach { case (c, i) =>
      val slice = java.util.Arrays.copyOfRange(
        bytes, c.offset.toInt, (c.offset + c.length).toInt)
      // the slice is itself a well-formed single-member .warc.gz
      val r = Warc.parse(new ByteArrayInputStream(slice)).toSeq
      assert(r.size == 1 && r.head.status == 200 + i)
    }
  }

  test("multi-record gzip member: every record shares the member extent") {
    val member = new ByteArrayOutputStream()
    member.write(rec(0)); member.write(rec(1))
    val bytes = Warc.gzipMember(member.toByteArray)
    val caps = Cdx.captures(new ByteArrayInputStream(bytes)).toSeq
    assert(caps.size == 2)
    assert(caps.map(_.offset).distinct == Seq(0L))
    assert(caps.map(_.length).distinct == Seq(bytes.length.toLong))
  }

  // ------------------------------------------------------------ mime/policy

  private def raw(tpe: String, uri: String, cType: String,
      block: String): Array[Byte] = {
    val s = new StringBuilder
    s ++= "WARC/1.0\r\n"
    s ++= s"WARC-Type: $tpe\r\n"
    if (uri.nonEmpty) s ++= s"WARC-Target-URI: $uri\r\n"
    if (cType.nonEmpty) s ++= s"Content-Type: $cType\r\n"
    s ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
    s ++= s"Content-Length: ${block.getBytes("UTF-8").length}\r\n\r\n"
    s ++= block
    s ++= "\r\n\r\n"
    s.toString.getBytes("UTF-8")
  }

  test("mime: response takes the HTTP Content-Type (params stripped), " +
       "resource takes the WARC Content-Type, absent becomes 'unk'") {
    val out = new ByteArrayOutputStream()
    out.write(raw("response", "https://a.test/", "application/http; msgtype=response",
      "HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=UTF-8\r\n\r\nhi"))
    out.write(raw("resource", "https://b.test/", "application/json", "{}"))
    out.write(raw("response", "https://c.test/", "application/http; msgtype=response",
      "HTTP/1.1 200 OK\r\n\r\nno ct"))
    out.write(raw("warcinfo", "", "application/warc-fields", "software: x"))
    val caps = Cdx.captures(new ByteArrayInputStream(out.toByteArray)).toSeq
    assert(caps.map(c => (c.url, c.mime)) == Seq(
      ("https://a.test/", "text/html"),
      ("https://b.test/", "application/json"),
      ("https://c.test/", "unk")))
  }

  test("a record not terminated by CRLFCRLF fails loudly (offsets would " +
       "be unreliable otherwise)") {
    val good = rec(0)
    val bad = new ByteArrayOutputStream()
    bad.write(good, 0, good.length - 4) // strip the record terminator
    bad.write(rec(1))
    val e = intercept[java.io.EOFException] {
      Cdx.captures(new ByteArrayInputStream(bad.toByteArray)).toSeq
    }
    assert(e.getMessage.contains("CRLFCRLF"))
  }

  test("EOF immediately after the final block is tolerated") {
    val good = rec(0)
    val trimmed = java.util.Arrays.copyOfRange(good, 0, good.length - 4)
    val caps = Cdx.captures(new ByteArrayInputStream(trimmed)).toSeq
    assert(caps.size == 1)
    assert(caps.head.length == trimmed.length.toLong)
  }

  // ----------------------------------------------------------------- Spark

  test("Cdx.index over a mixed plain/gz directory: schema, filenames, " +
       "extents valid per file") {
    val dir = java.nio.file.Files.createTempDirectory("cdxspec")
    val plain = new ByteArrayOutputStream()
    (0 until 3).foreach(i => plain.write(rec(i)))
    java.nio.file.Files.write(dir.resolve("a.warc"), plain.toByteArray)
    val gz = new ByteArrayOutputStream()
    (3 until 5).foreach(i => gz.write(Warc.gzipMember(rec(i))))
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz.toByteArray)
    val df = Cdx.index(spark, dir.toString + "/*")
    assert(df.columns.toSeq == Seq("surt", "ts14", "url", "status", "mime",
      "digest", "filename", "offset", "length"))
    val rows = df.collect().map(r => (r.getString(6), r.getLong(7),
      r.getLong(8), r.getInt(3))).toSeq
    assert(rows.size == 5)
    assert(rows.count(_._1 == "a.warc") == 3)
    assert(rows.count(_._1 == "b.warc.gz") == 2)
    // per-file extents tile from 0 to the file's byte length
    Seq("a.warc" -> plain.size(), "b.warc.gz" -> gz.size()).foreach {
      case (f, total) =>
        val ext = rows.filter(_._1 == f).sortBy(_._2)
        assert(ext.head._2 == 0L)
        ext.sliding(2).foreach { case Seq(a, b) => assert(a._2 + a._3 == b._2) }
        assert(ext.last._2 + ext.last._3 == total.toLong)
    }
  }
}

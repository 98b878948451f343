package graft.sources

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkRecords(n: Int): ByteArrayOutputStream = {
    val out = new ByteArrayOutputStream()
    (0 until n).foreach { i =>
      Warc.writeResponse(out, s"https://h$i.example.test/p$i",
        java.time.Instant.ofEpochSecond(1700000000L + i), 200 + i,
        s"<html>page $i</html>".getBytes("UTF-8"))
    }
    out
  }

  test("round-trip: write N response records, parse them back exactly") {
    val bytes = mkRecords(5).toByteArray
    val got = Warc.parse(new java.io.ByteArrayInputStream(bytes)).toSeq
    assert(got.size == 5)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.url == s"https://h$i.example.test/p$i")
      assert(r.ts.toInstant.getEpochSecond == 1700000000L + i)
      assert(r.status == 200 + i)
      assert(new String(r.payload, "UTF-8") == s"<html>page $i</html>")
    }
  }

  test("multi-member gzip (the Common Crawl layout) parses transparently") {
    val members = new ByteArrayOutputStream()
    (0 until 3).foreach { i =>
      val one = new ByteArrayOutputStream()
      Warc.writeResponse(one, s"https://gz.example.test/$i",
        java.time.Instant.ofEpochSecond(1700000000L), 200,
        s"gz $i".getBytes("UTF-8"))
      members.write(Warc.gzipMember(one.toByteArray))
    }
    val got = Warc.parse(
      new java.io.ByteArrayInputStream(members.toByteArray)).toSeq
    assert(got.map(r => new String(r.payload, "UTF-8")) ==
      Seq("gz 0", "gz 1", "gz 2"))
  }

  test("request/warcinfo records and missing-URI records are skipped") {
    val out = new ByteArrayOutputStream()
    def raw(tpe: String, uriLine: String, block: String): Unit = {
      val s = new StringBuilder
      s ++= "WARC/1.0\r\n"
      s ++= s"WARC-Type: $tpe\r\n"
      if (uriLine.nonEmpty) s ++= s"WARC-Target-URI: $uriLine\r\n"
      s ++= "WARC-Date: 2026-01-01T00:00:00Z\r\n"
      s ++= s"Content-Length: ${block.getBytes("UTF-8").length}\r\n\r\n"
      s ++= block
      s ++= "\r\n\r\n"
      out.write(s.toString.getBytes("UTF-8"))
    }
    raw("warcinfo", "", "software: test")
    raw("request", "https://x.test/", "GET / HTTP/1.1\r\n\r\n")
    raw("resource", "https://kept.test/", "raw payload bytes")
    raw("response", "", "HTTP/1.1 200 OK\r\n\r\nbody") // no URI -> skipped
    val got = Warc.parse(
      new java.io.ByteArrayInputStream(out.toByteArray)).toSeq
    assert(got.map(_.url) == Seq("https://kept.test/"))
    assert(got.head.status == 200 &&
      new String(got.head.payload, "UTF-8") == "raw payload bytes")
  }

  test("httpPayload: status parse, header split, header-only and non-HTTP blocks") {
    val (s1, b1) = Warc.httpPayload(
      "HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nnope".getBytes("UTF-8"))
    assert(s1 == 404 && new String(b1, "UTF-8") == "nope")
    val (s2, b2) = Warc.httpPayload("HTTP/1.1 301 Moved\r\n".getBytes("UTF-8"))
    assert(s2 == 301 && b2.isEmpty) // no CRLFCRLF -> empty body
    val (s3, b3) = Warc.httpPayload("just bytes".getBytes("UTF-8"))
    assert(s3 == 200 && new String(b3, "UTF-8") == "just bytes")
  }

  test("truncated content block and garbage framing fail loudly") {
    val good = mkRecords(1).toByteArray
    intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(
        good.dropRight(20))).toSeq
    }
    intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(
        "NOT-A-WARC\r\n".getBytes("UTF-8"))).toSeq
    }
  }

  test("corrupt gzip member boundary fails loudly, never silent truncation") {
    // member 1 valid, then garbage where member 2's header should be —
    // JDK GZIPInputStream reports clean EOF here (records silently lost);
    // the strict stream must throw instead
    val m1 = {
      val one = new ByteArrayOutputStream()
      Warc.writeResponse(one, "https://ok.test/0",
        java.time.Instant.ofEpochSecond(1700000000L), 200,
        "first".getBytes("UTF-8"))
      Warc.gzipMember(one.toByteArray)
    }
    val bad = new ByteArrayOutputStream()
    bad.write(m1)
    bad.write(Array[Byte](0x1f, 0x55, 0x00, 0x01, 0x02)) // bad magic
    val e = intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(bad.toByteArray)).toSeq
    }
    assert(e.getMessage.contains("magic"))
    // flipped bit inside a member's deflate body -> CRC/format error
    val flipped = m1.clone()
    flipped(flipped.length - 12) = (flipped(flipped.length - 12) ^ 0x40).toByte
    intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(flipped)).toSeq
    }
    // truncated mid-member -> loud
    intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(
        m1.dropRight(5))).toSeq
    }
  }

  test("strict framing: missing WARC-Date and malformed header lines throw") {
    val noDate = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: https://x.test/\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    val e = intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(
        noDate.getBytes("UTF-8"))).toSeq
    }
    assert(e.getMessage.contains("WARC-Date"))
    val badLine = ("WARC/1.0\r\nWARC-Type resource no colon here\r\n" +
      "Content-Length: 0\r\n\r\n\r\n\r\n")
    intercept[java.io.EOFException] {
      Warc.parse(new java.io.ByteArrayInputStream(
        badLine.getBytes("UTF-8"))).toSeq
    }
  }

  test("folded header values (SP/HTAB continuation) and UTF-8 URIs parse") {
    val uri = "https://café.test/über"
    val rec = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "WARC-Target-URI: " + uri.substring(0, 14) + "\r\n " +
      uri.substring(14) + "\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    val got = Warc.parse(new java.io.ByteArrayInputStream(
      rec.getBytes("UTF-8"))).toSeq
    assert(got.size == 1)
    // folding joins with a single space at the fold point
    assert(got.head.url == uri.substring(0, 14) + " " + uri.substring(14))
    assert(got.head.url.contains("café"))
  }

  test("unparseable HTTP status is 0 (unknown), multi-space form tolerated") {
    val (s1, _) = Warc.httpPayload(
      "HTTP/1.1  404 Not Found\r\n\r\nx".getBytes("UTF-8"))
    assert(s1 == 404) // double space: RFC-tolerated sloppy form
    val (s2, _) = Warc.httpPayload(
      "HTTP/1.1 ??? huh\r\n\r\nx".getBytes("UTF-8"))
    assert(s2 == 0) // never silently 200
  }

  test("Spark read over a mixed plain/gzip directory") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    java.nio.file.Files.write(dir.resolve("a.warc"), mkRecords(3).toByteArray)
    val gz = new ByteArrayOutputStream()
    (0 until 2).foreach { i =>
      val one = new ByteArrayOutputStream()
      Warc.writeResponse(one, s"https://gzfile.test/$i",
        java.time.Instant.ofEpochSecond(1700000100L + i), 200,
        s"z$i".getBytes("UTF-8"))
      gz.write(Warc.gzipMember(one.toByteArray))
    }
    java.nio.file.Files.write(dir.resolve("b.warc.gz"), gz.toByteArray)
    val df = Warc.read(spark, dir.toString + "/*")
    assert(df.columns.toSeq == Seq("url", "warc_ts", "status", "html"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(rows.size == 5)
    assert(rows.count(_._1.startsWith("https://gzfile.test/")) == 2)
    assert(rows.count(_._1.startsWith("https://h")) == 3)
  }

  test("review pin: httpMime with unterminated headers is None — payload " +
      "bytes are never scanned for header-shaped text") {
    val truncated = ("HTTP/1.1 200 OK\r\nx-note: truncated\r\n" +
      "content-type: application/pdf").getBytes("US-ASCII") // no CRLFCRLF
    assert(Warc.httpMime(truncated).isEmpty)
    val ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
      "\r\n\r\ncontent-type: application/pdf in the body").getBytes("US-ASCII")
    assert(Warc.httpMime(ok).contains("text/html"))
    // httpPayload with truncated headers: empty body, status still parsed
    val (st, body) = Warc.httpPayload(truncated)
    assert(st == 200 && body.isEmpty)
  }
}

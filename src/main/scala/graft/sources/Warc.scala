package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * WARC (ISO 28500 / WARC/1.0 — the Common Crawl container) source: the
 * ingestion path that turns crawl archives into the engine's pages table
 * (`url`, `warc_ts`, `status`, `html`), mirroring the reference's
 * Common-Crawl-style input shape (BASELINE input_hint). The reference
 * itself fetches live pages; reading WARC is what the same pipeline looks
 * like when the fetch stage is an archive drop.
 *
 * Format handled (spec-level, not copied from any implementation):
 *   - version line `WARC/1.0` (or 1.1), CRLF header block, `Content-Length`
 *     octet-exact content block, CRLF CRLF record separator;
 *   - `response` records: the block is an HTTP/1.x message — status parsed
 *     from the status line, payload = bytes after the first CRLFCRLF;
 *   - `resource` records: the block IS the payload (status 200);
 *   - all other record types (warcinfo, request, metadata, revisit) are
 *     skipped, as is any record without a Target-URI;
 *   - per-record gzip members concatenated in one `.warc.gz` file (the
 *     Common Crawl layout), auto-detected by magic bytes.
 *
 * Scale shape: parallelism is per FILE — Common Crawl sizes archives at
 * ~1 GB gzip precisely so file-granularity is enough, and multi-member
 * gzip cannot be split mid-file without an external index. Each task
 * STREAMS its file (PortableDataStream.open, 64 KB buffered): memory is
 * O(largest record), never O(file). Downstream partitioning: a
 * `repartition(url-hash)` after read co-locates with the corpus bucketing
 * the fetch join expects (CrawlEngine corpus contract).
 */
object Warc {

  final case class Record(url: String, ts: java.sql.Timestamp,
    status: Int, payload: Array[Byte])

  // ---------------------------------------------------------------- parse

  /** Read one CRLF-terminated ASCII line; None at clean EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val buf = new ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return None
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val a = buf.toByteArray
    val n = if (a.nonEmpty && a(a.length - 1) == '\r') a.length - 1 else a.length
    Some(new String(a, 0, n, US_ASCII))
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record content block of $n bytes")
    val out = new Array[Byte](n.toInt)
    var off = 0
    while (off < out.length) {
      val r = in.read(out, off, out.length - off)
      if (r < 0) throw new EOFException(
        s"truncated WARC content block: expected ${out.length} bytes, got $off")
      off += r
    }
    out
  }

  /** Split an HTTP/1.x message into (status, body). A block that does not
    * start with "HTTP/" is taken whole with status 200 (resource-style). */
  private[sources] def httpPayload(block: Array[Byte]): (Int, Array[Byte]) = {
    if (block.length < 5 ||
        !new String(block, 0, 5, US_ASCII).equals("HTTP/"))
      return (200, block)
    var i = 0
    var bodyAt = block.length
    while (i + 3 < block.length && bodyAt == block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') bodyAt = i + 4
      i += 1
    }
    val statusLine = new String(block, 0, math.min(64, block.length), US_ASCII)
      .takeWhile(c => c != '\r' && c != '\n')
    val status = statusLine.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(200)
    (status, java.util.Arrays.copyOfRange(block, bodyAt, block.length))
  }

  /** Iterate response/resource records of one (possibly multi-member-gzip)
    * WARC stream. Malformed framing fails loudly — a silently skipped tail
    * would under-read the corpus. */
  def parse(raw: InputStream): Iterator[Record] = new Iterator[Record] {
    private val in: InputStream = {
      val pb = new java.io.PushbackInputStream(
        new java.io.BufferedInputStream(raw, 64 * 1024), 2)
      val b0 = pb.read(); val b1 = pb.read()
      if (b1 >= 0) pb.unread(b1)
      if (b0 >= 0) pb.unread(b0)
      if (b0 == 0x1f && b1 == 0x8b)
        // concatenated members: GZIPInputStream reads them back-to-back
        new java.util.zip.GZIPInputStream(pb, 64 * 1024)
      else pb
    }
    private var nextRec: Record = _
    private def advance(): Unit = {
      nextRec = null
      while (nextRec == null) {
        // skip inter-record blank lines; stop at EOF
        var line = readLine(in)
        while (line.contains("")) line = readLine(in)
        line match {
          case None => return
          case Some(v) if v.startsWith("WARC/") =>
            val headers = scala.collection.mutable.Map.empty[String, String]
            var h = readLine(in).getOrElse(throw new EOFException(
              "truncated WARC header block"))
            while (h.nonEmpty) {
              val i = h.indexOf(':')
              if (i > 0)
                headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
              h = readLine(in).getOrElse(throw new EOFException(
                "truncated WARC header block"))
            }
            val len = headers.getOrElse("content-length", throw new EOFException(
              "WARC record without Content-Length")).toLong
            val block = readFully(in, len)
            val tpe = headers.getOrElse("warc-type", "")
            val uri = headers.get("warc-target-uri")
            if ((tpe == "response" || tpe == "resource") && uri.isDefined) {
              val ts = java.sql.Timestamp.from(
                java.time.Instant.parse(headers.getOrElse("warc-date",
                  "1970-01-01T00:00:00Z")))
              val (status, payload) =
                if (tpe == "response") httpPayload(block) else (200, block)
              nextRec = Record(uri.get, ts, status, payload)
            }
          case Some(other) => throw new EOFException(
            s"expected WARC/ version line, got '${other.take(40)}'")
        }
      }
    }
    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): Record = {
      val r = nextRec; advance(); r
    }
  }

  // ---------------------------------------------------------------- write

  private def crlf(sb: ByteArrayOutputStream, s: String): Unit =
    sb.write((s + "\r\n").getBytes(US_ASCII))

  /** One WARC/1.0 response record (deterministic — no random record ids). */
  def writeResponse(out: ByteArrayOutputStream, url: String,
      ts: java.time.Instant, status: Int, payload: Array[Byte]): Unit = {
    val http = new ByteArrayOutputStream()
    crlf(http, s"HTTP/1.1 $status OK")
    crlf(http, "Content-Type: text/html")
    crlf(http, s"Content-Length: ${payload.length}")
    crlf(http, "")
    http.write(payload)
    val block = http.toByteArray
    crlf(out, "WARC/1.0")
    crlf(out, "WARC-Type: response")
    crlf(out, s"WARC-Record-ID: <urn:graft:${graft.frontier.SeenBloom.hash64(url)}>")
    crlf(out, s"WARC-Date: $ts")
    crlf(out, s"WARC-Target-URI: $url")
    crlf(out, "Content-Type: application/http; msgtype=response")
    crlf(out, s"Content-Length: ${block.length}")
    crlf(out, "")
    out.write(block)
    crlf(out, "")
    crlf(out, "")
  }

  /** Gzip one record as its own member (the Common Crawl layout). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  // ----------------------------------------------------------------- read

  /** DataFrame(url string, warc_ts timestamp, status int, html binary)
    * over a glob of .warc / .warc.gz files. One task per file (see object
    * doc for why that is the right granularity); each task streams. */
  def read(spark: SparkSession, pathGlob: String,
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, mp)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        new Iterator[Record] {
          private val it = parse(in)
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Record = it.next()
        }
      }
      .map(r => (r.url, r.ts, r.status, r.payload))
      .toDF("url", "warc_ts", "status", "html")
  }
}

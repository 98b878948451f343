package graft.sources

import java.io.{EOFException, InputStream}
import graft.core.UrlOps
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * CDX capture index over WARC archives — the web-archive lookup structure
 * (the public CDX(J) convention of Heritrix/OpenWayback/pywb and the Common
 * Crawl index): one row per archived capture, keyed by SURT-canonical URL +
 * 14-digit timestamp, carrying enough (filename, offset, length) to
 * range-request the record back out of the archive without scanning it.
 *
 * Extent semantics (what offset/length address):
 *   - plain `.warc`: the record's byte extent in the file, from the first
 *     byte of its `WARC/1.0` version line through its two-CRLF terminator
 *     (ISO 28500 §4 — the terminator belongs to the record);
 *   - `.warc.gz`: the COMPRESSED extent of the gzip member the record lives
 *     in — the Common Crawl convention (one record per member) where a
 *     reader gunzips exactly the ranged bytes. A member holding several
 *     records yields one row per record, all sharing the member extent —
 *     the member is the smallest independently-decompressable unit.
 *
 * Both variants are verified by slice-and-reparse tests (CdxSpec): reading
 * back exactly [offset, offset+length) must reproduce the record.
 *
 * Digest is md5-hex of the payload (the DuckDB-replayable choice; classic
 * CDX uses sha1-base32 — a one-line swap in [[Cdx.md5hex]]'s caller).
 *
 * Scale shape: indexing parallelism is per archive FILE (like [[Warc.read]]
 * — 1 GB members make file granularity sufficient); each task streams with
 * O(record) memory and emits captures as it goes — no sort, no shuffle. The
 * global (surt, ts) index order at 100 TB is a `repartitionByRange(surt)` +
 * `sortWithinPartitions` write, giving domain-contiguous index shards a
 * lookup can partition-prune by SURT prefix.
 */
object Cdx {

  final case class Capture(surt: String, ts14: String, url: String,
    status: Int, mime: String, digest: String, offset: Long, length: Long)

  /** Byte-position-tracking wrapper; `pos` = bytes delivered so far. */
  private final class CountingInputStream(in: InputStream) extends InputStream {
    var pos: Long = 0L
    override def read(): Int = {
      val b = in.read(); if (b >= 0) pos += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = in.read(b, off, len); if (n > 0) pos += n; n
    }
    override def close(): Unit = in.close()
  }

  private def md5hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    String.format("%032x", new java.math.BigInteger(1, d))
  }

  private val Ts14 = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMddHHmmss").withZone(java.time.ZoneOffset.UTC)

  /** Record → capture row (None for record types the index skips). */
  private def capture(headers: scala.collection.Map[String, String],
      block: Array[Byte], off: Long, len: Long): Option[Capture] =
    Warc.toRecord(headers, block).map { r =>
      val mime = headers.getOrElse("warc-type", "") match {
        case "response" => Warc.httpMime(block).getOrElse("unk")
        case _ => // resource: the WARC Content-Type header IS the payload type
          headers.get("content-type").map(_.split(";")(0).trim.toLowerCase)
            .filter(_.nonEmpty).getOrElse("unk")
      }
      Capture(UrlOps.surt(r.url), Ts14.format(r.ts.toInstant), r.url,
        r.status, mime, md5hex(r.payload), off, len)
    }

  /** Scan one UNCOMPRESSED WARC stream, yielding captures whose extents are
    * byte positions in that stream. Strict: a record not terminated by the
    * ISO 28500 two-CRLF separator fails loudly (a tolerant skip would make
    * the very offsets this index exists to provide unreliable). */
  private def scanRecords(cin: CountingInputStream): Iterator[Capture] =
    new Iterator[Capture] {
      private var nextCap: Capture = _
      private def advance(): Unit = {
        nextCap = null
        while (nextCap == null) {
          // any stray blank lines between records belong to no record
          var start = cin.pos
          var line = Warc.readLine(cin)
          while (line.contains("")) { start = cin.pos; line = Warc.readLine(cin) }
          line match {
            case None => return
            case Some(v) if v.startsWith("WARC/") =>
              val (headers, block) = Warc.readHeadersAndBlock(cin)
              // consume the record's two-CRLF terminator eagerly so the
              // extent covers the full record (EOF right after the final
              // block is tolerated — some writers drop the last separator)
              var k = 0
              while (k < 2) {
                Warc.readLine(cin) match {
                  case Some("") => k += 1
                  case Some(x) => throw new EOFException(
                    s"record not terminated by CRLFCRLF (got '${x.take(40)}')")
                  case None => k = 2
                }
              }
              nextCap = capture(headers, block, start, cin.pos - start).orNull
            case Some(other) => throw new EOFException(
              s"expected WARC/ version line, got '${other.take(40)}'")
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextCap != null
      override def next(): Capture = { val c = nextCap; advance(); c }
    }

  /** Captures of one archive stream; gzip auto-detected by magic bytes
    * (peek + pushback sizing shared with Warc.decoded via Warc.peekGzip —
    * this path needs the concrete StrictGzipStream for member extents). */
  private[sources] def captures(raw: InputStream): Iterator[Capture] = {
    val (pb, isGzip) = Warc.peekGzip(raw)
    if (isGzip) {
      val gz = new Warc.StrictGzipStream(pb)
      Iterator.continually(gz.readMember()).takeWhile(_.isDefined).flatMap {
        member =>
          val (start, len, bytes) = member.get
          scanRecords(new CountingInputStream(
            new java.io.ByteArrayInputStream(bytes)))
            .map(_.copy(offset = start, length = len))
      }
    } else scanRecords(new CountingInputStream(pb))
  }

  /** DataFrame(surt, ts14, url, status, mime, digest, filename, offset,
    * length) over a glob of .warc / .warc.gz files — one streaming task per
    * file, no shuffle; ordering/partitioning is the caller's write policy. */
  def index(spark: SparkSession, pathGlob: String,
      minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(pathGlob, mp)
      .flatMap { case (path, pds) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val in = pds.open()
        // close on ANY task exit (limit/take/exception), like Warc.read
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val it = captures(in)
        new Iterator[Capture] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close() // prompt close at exhaustion (idempotent)
            h
          }
          override def next(): Capture = it.next()
        }.map(c => (c.surt, c.ts14, c.url, c.status, c.mime, c.digest,
          name, c.offset, c.length))
      }
      .toDF("surt", "ts14", "url", "status", "mime", "digest",
        "filename", "offset", "length")
  }
}

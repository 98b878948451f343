package graft.core

import java.nio.charset.{Charset, StandardCharsets}

/**
 * Charset sniffing + decoding for raw fetched page bytes.
 *
 * The reference gets decoding for free from its HTTP client (got-scraping
 * honours content-type headers and falls back to a jschardet-style sniff
 * inside Crawlee's `parseWithCheerio`); over an archived `html: binary`
 * column there is no transport header, so the WHATWG in-band rules are the
 * whole contract. This implements the deterministic core of that algorithm
 * (https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding):
 *
 *  1. BOM wins: EF BB BF → utf-8, FF FE → utf-16le, FE FF → utf-16be
 *     (the BOM bytes are NOT part of the decoded document);
 *  2. else scan the first 1024 bytes (decoded as latin-1, which is
 *     byte-transparent) for a `<meta charset=...>` or
 *     `<meta http-equiv=content-type content="...charset=...">`
 *     declaration — first match wins, names ASCII-case-insensitive;
 *  3. else utf-8 (the modern-web default; the statistical-frequency
 *     fallback in jschardet is deliberately out of scope — it is
 *     heuristic, version-dependent, and not reproducible).
 *
 * Alias folding covers the names that dominate web corpora: `utf8`,
 * `latin1`/`iso8859-1`/`l1` → their canonical names, `ascii`/`us-ascii` →
 * utf-8 supersets them. Unknown or JVM-unsupported names fall back to
 * utf-8 rather than failing the row — at 100 TB a malformed charset
 * attribute must cost one default-decoded document, not a task retry.
 *
 * Scale shape: pure per-row kernel — no shuffle, no state; runs inside
 * whatever scan already reads the binary column.
 */
object CharsetSniff {

  /** Sniff result: canonical charset name + BOM length to skip. */
  final case class Sniffed(charset: String, bomBytes: Int)

  private val MetaCharset =
    """(?i)charset\s*=\s*["']?\s*([a-zA-Z0-9._:-]+)""".r

  private def fold(name: String): String = name.toLowerCase match {
    case "utf8" | "ascii" | "us-ascii"                     => "utf-8"
    case "latin1" | "latin-1" | "iso8859-1" | "l1" | "cp819" => "iso-8859-1"
    case "utf-16" | "utf16"                                => "utf-16"
    case other                                             => other
  }

  def sniff(bytes: Array[Byte]): Sniffed = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte &&
        bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return Sniffed("utf-8", 3)
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return Sniffed("utf-16le", 2)
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return Sniffed("utf-16be", 2)
    val head = new String(bytes, 0, math.min(1024, bytes.length),
      StandardCharsets.ISO_8859_1)
    MetaCharset.findFirstMatchIn(head) match {
      case Some(m) => Sniffed(fold(m.group(1)), 0)
      case None    => Sniffed("utf-8", 0)
    }
  }

  /** Sniff + decode; returns (canonical charset used, decoded text).
    * Malformed sequences decode with the charset's replacement character
    * (JVM REPLACE action) — never a per-row failure. */
  def decode(bytes: Array[Byte]): (String, String) = {
    val s = sniff(bytes)
    val cs =
      try Charset.forName(s.charset)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(
      bytes, s.bomBytes, bytes.length - s.bomBytes)).toString
    (s.charset, text)
  }
}

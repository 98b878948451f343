package graft.core

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class CharsetSniffSpec extends AnyFunSuite {

  test("BOM wins over any meta declaration and is stripped from the text") {
    val utf8Bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      """<meta charset="iso-8859-1"><p>café</p>""".getBytes(StandardCharsets.UTF_8)
    assert(CharsetSniff.sniff(utf8Bom) == CharsetSniff.Sniffed("utf-8", 3))
    val (cs, text) = CharsetSniff.decode(utf8Bom)
    assert(cs == "utf-8")
    assert(text == """<meta charset="iso-8859-1"><p>café</p>""")

    val le = Array(0xFF, 0xFE).map(_.toByte) ++ "héllo".getBytes(StandardCharsets.UTF_16LE)
    assert(CharsetSniff.decode(le) == (("utf-16le", "héllo")))
    val be = Array(0xFE, 0xFF).map(_.toByte) ++ "héllo".getBytes(StandardCharsets.UTF_16BE)
    assert(CharsetSniff.decode(be) == (("utf-16be", "héllo")))
  }

  test("meta charset in the first 1024 bytes, either syntax, aliases folded") {
    def b(s: String, cs: String) = s.getBytes(cs)
    assert(CharsetSniff.decode(b("""<meta charset="UTF-8"><p>café""", "UTF-8"))
      ._1 == "utf-8")
    val (cs1, t1) = CharsetSniff.decode(
      b("""<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1"><p>café""",
        "ISO-8859-1"))
    assert(cs1 == "iso-8859-1" && t1.endsWith("café"))
    // alias folding
    assert(CharsetSniff.sniff(b("<meta charset=utf8>x", "UTF-8")).charset == "utf-8")
    assert(CharsetSniff.sniff(b("<meta charset='latin1'>x", "UTF-8")).charset == "iso-8859-1")
    // a declaration beyond the 1024-byte prelude is not seen
    val late = (" " * 1100) + """<meta charset="iso-8859-1">"""
    assert(CharsetSniff.sniff(late.getBytes("UTF-8")).charset == "utf-8")
  }

  test("defaults and hostile inputs never fail the row") {
    assert(CharsetSniff.decode("plain ascii".getBytes("UTF-8"))
      == (("utf-8", "plain ascii")))
    // unsupported charset name -> utf-8 fallback decode
    val (cs, _) = CharsetSniff.decode("<meta charset=klingon-9>x".getBytes("UTF-8"))
    assert(cs == "klingon-9") // sniffed name reported, decode fell back
    // malformed utf-8 decodes with replacement chars, no exception
    val bad = Array(0x68, 0xC3, 0x28, 0x69).map(_.toByte)
    val (_, text) = CharsetSniff.decode(bad)
    assert(text.startsWith("h") && text.endsWith("i"))
    assert(CharsetSniff.decode(Array.emptyByteArray) == (("utf-8", "")))
  }
}

package graft.core

import org.scalatest.funspec.AnyFunSpec
import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/**
 * The golden byte-fixture corpus (FIXTURES.md §2): for every case directory
 * under `src/test/resources/golden/<case>/`, runs the extraction kernel over
 * `input.html` and byte-compares against the committed expected files:
 *
 *   markdown.md    — htmlToMarkdown over the cleaned html
 *                    (html-to-markdown.ts:3-213 rules + turndown v7 defaults)
 *   text.txt       — html-to-text v9 defaults over the RAW html
 *                    (DataExtractor.ts:276)
 *   title.txt      — $('title').text().trim()  (DataExtractor.ts:158-162)
 *   metadata.json  — [{name,content,property?}] (DataExtractor.ts:175-198)
 *   links.json     — absolutized, ordered, de-duped out-links
 *                    (Base.ts:362-403)
 *
 * Optional per-case `options.txt` lines: `include=<sel,sel>`,
 * `exclude=<sel,sel>`, `base=<url>` (default base
 * https://golden.example.test/docs/page.html).
 *
 * Regenerate with GOLDEN_UPDATE=1 (every regenerated diff must be re-audited
 * against the reference rules before committing — the goldens are the
 * oracle, not the implementation).
 */
class GoldenSpec extends AnyFunSpec {

  private val root: Path = Paths.get("src/test/resources/golden")
  private val update: Boolean = sys.env.get("GOLDEN_UPDATE").contains("1")
  private val DefaultBase = "https://golden.example.test/docs/page.html"

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def metadataJson(entries: Seq[Extractor.MetaEntry]): String =
    if (entries.isEmpty) "[]"
    else entries.map { m =>
      val prop = m.property.map(p => s""","property":"${jsonEscape(p)}"""").getOrElse("")
      s"""  {"name":"${jsonEscape(m.name)}","content":"${jsonEscape(m.content)}"$prop}"""
    }.mkString("[\n", ",\n", "\n]")

  private def linksJson(links: Seq[String]): String =
    if (links.isEmpty) "[]"
    else links.map(l => s"""  "${jsonEscape(l)}"""").mkString("[\n", ",\n", "\n]")

  private def parseOptions(p: Path): (Cleaner.Options, String) = {
    var include: Seq[String] = Nil
    var exclude: Seq[String] = Nil
    var base = DefaultBase
    if (Files.exists(p)) {
      new String(Files.readAllBytes(p), UTF_8).linesIterator.foreach { line =>
        line.split("=", 2) match {
          case Array("include", v) => include = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          case Array("exclude", v) => exclude = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          case Array("base", v)    => base = v.trim
          case _ =>
        }
      }
    }
    (Cleaner.Options(includeTags = include, excludeTags = exclude), base)
  }

  private def check(dir: Path, file: String, produced: String): Unit = {
    val path = dir.resolve(file)
    val bytes = produced.getBytes(UTF_8)
    if (update) {
      Files.write(path, bytes)
    } else {
      assert(Files.exists(path), s"missing golden file ${path}")
      val expected = Files.readAllBytes(path)
      if (!java.util.Arrays.equals(expected, bytes)) {
        val exp = new String(expected, UTF_8)
        fail(s"byte mismatch in ${dir.getFileName}/$file\n--- expected ---\n$exp\n--- produced ---\n$produced\n---")
      }
    }
  }

  val caseDirs: Seq[Path] =
    if (Files.isDirectory(root))
      Files.list(root).iterator.asScala.filter(d => Files.isDirectory(d) && Files.exists(d.resolve("input.html"))).toSeq.sortBy(_.getFileName.toString)
    else Seq.empty

  assert(caseDirs.nonEmpty, s"no golden cases found under $root")

  caseDirs.foreach { dir =>
    it(s"golden: ${dir.getFileName}") {
      val html = new String(Files.readAllBytes(dir.resolve("input.html")), UTF_8)
      val (cleanOpts, base) = parseOptions(dir.resolve("options.txt"))
      val ext = Extractor.extract(base, html, Extractor.Formats(), cleanOpts)
      check(dir, "markdown.md", ext.markdown.getOrElse(""))
      check(dir, "text.txt", ext.text.getOrElse(""))
      check(dir, "title.txt", ext.title)
      check(dir, "metadata.json", metadataJson(ext.metadata))
      check(dir, "links.json", linksJson(ext.links))
    }
  }
}

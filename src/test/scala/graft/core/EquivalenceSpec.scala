package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property: the kernel's fast paths are byte-equivalent to the reference-
 * shaped string pipelines over ARBITRARY generated HTML — not just the 47
 * curated golden cases:
 *
 *  1. `Markdown.fromCleanedDoc(Cleaner.transformDoc(...))` ==
 *     `Markdown.fromHtml(Cleaner.transformHtml(...))` (the DOM handoff
 *     skips serialize -> string-preprocess -> re-parse; this property pins
 *     that the DOM-level preprocess is exactly the string pre-pass);
 *  2. `TextExtract.fromDoc(parse(html))` == `TextExtract.fromHtml(html)`;
 *  3. the kernel is total (never throws) on generator output.
 */
class EquivalenceSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  // ---------------------------------------------------------- HTML grammar

  private val words = Gen.oneOf("alpha", "beta", "Gamma-δ", "x*y_z", "1. item",
    "tea & coffee", "a  b", "nb sp", "café", "中文", "[link]", "`code`")
  private val text: Gen[String] =
    Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k, words).map(_.mkString(" ")))

  private val inlineTag = Gen.oneOf("em", "strong", "span", "b", "i", "code")
  private val blockTag = Gen.oneOf("p", "div", "section", "blockquote", "h2", "h3")
  private val noiseTag = Gen.oneOf("header", "footer", "nav", "aside")

  private def node(depth: Int): Gen[String] =
    if (depth <= 0) text
    else Gen.frequency(
      4 -> text,
      2 -> (for { t <- inlineTag; c <- node(depth - 1) } yield s"<$t>$c</$t>"),
      2 -> (for { t <- blockTag; c <- node(depth - 1) } yield s"<$t>$c</$t>"),
      1 -> (for { c <- node(depth - 1); href <- Gen.oneOf("/a", "b.html", "?q=1", "#f", "http:/fix.me/x") }
              yield s"""<a href="$href">$c</a>"""),
      1 -> Gen.oneOf(
        """<img src="/i.png" alt="pic">""",
        """<img src="s.jpg" srcset="s.jpg 1x, l.jpg 2x" alt="x">""",
        "<br>", "<hr>", "<!-- note -->",
        "<ul><li>one</li><li>two</li></ul>",
        "<pre><code>val x = 1</code></pre>"),
      1 -> (for { t <- noiseTag; c <- node(depth - 1) } yield s"<$t>$c</$t>"),
      1 -> (for { a <- node(depth - 1); b <- node(depth - 1) } yield s"$a $b"))

  private val htmlGen: Gen[String] = for {
    title <- Gen.option(text)
    withMeta <- Gen.oneOf(true, false)
    body <- Gen.chooseNum(1, 3).flatMap(k => Gen.listOfN(k, node(3)).map(_.mkString("\n  ")))
  } yield {
    val head = title.map(t => s"<title>$t</title>").getOrElse("") +
      (if (withMeta) """<meta name="d" content="v">""" else "")
    s"<html><head>$head</head>\n<body>\n  $body\n</body></html>"
  }

  private val base = "https://fuzz.example.test/dir/page.html"

  test("DOM-handoff markdown == string-pipeline markdown on arbitrary HTML") {
    forAllSeeded(htmlGen, 400) { html =>
      val doc = Html.parse(html)
      val viaString = Markdown.fromHtml(Cleaner.transformHtml(doc, base))
      val viaDom = Cleaner.transformDoc(doc, base) match {
        case Left(root) => Markdown.fromCleanedDoc(root)
        case Right(d)   => Markdown.fromCleanedDoc(d)
      }
      assert(viaDom == viaString, s"\n--- html ---\n$html\n--- dom ---\n$viaDom\n--- str ---\n$viaString")
    }
  }

  test("TextExtract.fromDoc == fromHtml on arbitrary HTML") {
    forAllSeeded(htmlGen, 400) { html =>
      assert(TextExtract.fromDoc(Html.parse(html)) == TextExtract.fromHtml(html))
    }
  }

  test("extraction kernel is total on arbitrary generated HTML") {
    forAllSeeded(htmlGen, 200) { html =>
      val ex = Extractor.extract(base, html, Extractor.Formats(rawHtml = true))
      assert(ex.markdown.isDefined && ex.text.isDefined)
    }
  }
}

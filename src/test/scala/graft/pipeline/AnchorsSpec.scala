package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class AnchorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("anchors-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("pageAnchors: resolution, skip rules, occurrence order, no dedup") {
    val html =
      """<html><body>
        |<a href="#frag">skip</a>
        |<a href="javascript:void(0)">skip</a>
        |<a href="mailto:x@y.z">skip</a>
        |<a href="tel:+123">skip</a>
        |<a href="p2.html">Rel Link</a>
        |<a href="/root.html">Root</a>
        |<a href="./dot.html">Dot</a>
        |<a href="https:/h9.example.test/fix.html">Repair</a>
        |<a href="https://h3.example.test/abs.html">Abs</a>
        |<a href="https://h3.example.test/abs.html">Abs Again</a>
        |<a href="ftp://h3.example.test/file">skip scheme</a>
        |</body></html>""".stripMargin
    val got = Anchors.pageAnchors(html, "https://h1.example.test/dir/p1.html")
    assert(got == Seq(
      ("https://h1.example.test/dir/p2.html", "Rel Link"),
      ("https://h1.example.test/root.html", "Root"),
      ("https://h1.example.test/dir/dot.html", "Dot"),
      ("https://h9.example.test/fix.html", "Repair"),
      ("https://h3.example.test/abs.html", "Abs"),
      // same target twice: anchor occurrences are NOT deduped
      ("https://h3.example.test/abs.html", "Abs Again")))
  }

  test("topTerms: exact counts, rank order, tie-break, k cut") {
    // three pages all linking /t.html on one host; term counts:
    //   buy: 3, now: 2, cheap: 1  -> k=2 keeps buy, now
    val pages = Seq(
      ("https://h0.example.test/a.html",
        """<a href="/t.html">Buy now</a><a href="/t.html">buy cheap</a>"""),
      ("https://h0.example.test/b.html", """<a href="/t.html">BUY now</a>"""),
      ("https://h0.example.test/c.html", """<a href="/u.html">other</a>"""))
      .toDF("url", "html")
    val got = Anchors.topTerms(pages, "url", "html", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("https://h0.example.test/t.html", "buy", 3L, 1L),
      ("https://h0.example.test/t.html", "now", 2L, 2L),
      ("https://h0.example.test/u.html", "other", 1L, 1L)))
  }

  test("topTerms ties break by term ascending (total order)") {
    val pages = Seq(
      ("https://h0.example.test/a.html",
        """<a href="/t.html">zeta alpha</a>"""))
      .toDF("url", "html")
    val got = Anchors.topTerms(pages, "url", "html", k = 2).collect()
      .map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(got == Seq(("alpha", 1L), ("zeta", 2L)))
  }

  test("combiner flushes are invisible to results (cap = 1 forces flush-per-page)") {
    val pages = (0 until 50).map { i =>
      (s"https://h${i % 3}.example.test/p$i.html",
        s"""<a href="/t.html">common term</a><a href="/s$i.html">unique u$i</a>""")
    }.toDF("url", "html")
    val tiny = Anchors.topTerms(pages, "url", "html", k = 5, combinerCap = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val big = Anchors.topTerms(pages, "url", "html", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(tiny.toSeq == big.toSeq)
    // the hot same-host target aggregated across pages
    val hot = big.filter(_._1 == "https://h0.example.test/t.html").toSeq
    assert(hot.map(x => (x._2, x._3)).toSet == Set(("common", 17L), ("term", 17L)))
  }

  test("topTerms plan: exactly one exchange (repartition), no extra shuffle for agg or window") {
    val pages = Seq(("https://h0.example.test/a.html",
      """<a href="/t.html">x</a>""")).toDF("url", "html")
    val plan = Anchors.topTerms(pages, "url", "html", k = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
  }

  test("null url/html rows contribute nothing") {
    val pages = Seq(
      (null.asInstanceOf[String], """<a href="/t.html">x</a>"""),
      ("https://h0.example.test/a.html", null.asInstanceOf[String]),
      ("https://h0.example.test/b.html", """<a href="/t.html">kept</a>"""))
      .toDF("url", "html")
    val got = Anchors.topTerms(pages, "url", "html", k = 3).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("kept"))
  }
}

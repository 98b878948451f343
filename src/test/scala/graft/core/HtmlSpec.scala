package graft.core

import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {

  test("parse + text + attrs") {
    val doc = Html.parse("""<html><head><title>T &amp; U</title></head><body><p id="a" class="x y">hi <b>bold</b></p></body></html>""")
    val title = Html.selectFirst(doc, "title").get
    assert(title.text == "T & U")
    val p = Html.selectFirst(doc, "p").get
    assert(p.id.contains("a"))
    assert(p.classes == Set("x", "y"))
    assert(p.text == "hi bold")
  }

  test("void elements, self-closing, comments, doctype") {
    val doc = Html.parse("""<!DOCTYPE html><div><img src="x.png"><br/><!-- note --><span>s</span></div>""")
    val div = Html.selectFirst(doc, "div").get
    assert(div.elementChildren.map(_.tag) == Seq("img", "br", "span"))
    assert(div.children.exists { case Html.Comment(c) => c.trim == "note"; case _ => false })
  }

  test("script/style raw text is not parsed") {
    val doc = Html.parse("""<script>if (a < b && c > d) { x("<div>"); }</script><p>ok</p>""")
    val script = Html.selectFirst(doc, "script").get
    assert(script.text.contains("a < b && c > d"))
    assert(Html.selectFirst(doc, "p").get.text == "ok")
  }

  test("implied close: p closed by block, li by li") {
    val doc = Html.parse("<p>one<p>two<div>three</div>")
    assert(Html.select(doc, "p").map(_.text) == Seq("one", "two"))
    val doc2 = Html.parse("<ul><li>a<li>b<ul><li>c</ul></ul>")
    val lis = Html.select(doc2, "li")
    assert(lis.length == 3)
    assert(lis(1).text == "bc") // nested list stays inside second li
  }

  test("unclosed tags recover") {
    val doc = Html.parse("<div><b>bold<p>para</div><span>after</span>")
    assert(Html.selectFirst(doc, "span").get.text == "after")
  }

  test("entity decoding incl numeric") {
    assert(Html.decodeEntities("a &lt; b &amp;&amp; &#65;&#x42; &unknown; &copy;") == "a < b && AB &unknown; ©")
  }

  test("selectors: tag, class, id, attr, descendant, child, comma") {
    val doc = Html.parse(
      """<div id="top" class="main">
        |  <section><h3 class="t hl">x</h3></section>
        |  <div jscontroller="SC7lYd"><a href="/u"><h3>title</h3></a>
        |    <div data-sncf="1">desc<script>s()</script></div></div>
        |  <ul><li class="t">item</li></ul>
        |</div>""".stripMargin)
    assert(Html.select(doc, ".t").length == 2)
    assert(Html.select(doc, "#top").length == 1)
    assert(Html.select(doc, "h3.t.hl").length == 1)
    assert(Html.select(doc, """div[jscontroller="SC7lYd"]""").length == 1)
    assert(Html.select(doc, "a h3").length == 1)
    assert(Html.select(doc, "section > h3").length == 1)
    assert(Html.select(doc, "section > h3, li.t").length == 2)
    assert(Html.select(doc, """div[data-sncf="1"]""").head.text.contains("desc"))
    assert(Html.select(doc, "ul li").length == 1)
    assert(Html.select(doc, "div h3").length == 2)
  }

  test("render round-trip escapes") {
    val doc = Html.parse("""<p title="a&quot;b">x &lt; y</p>""")
    val out = Html.render(doc)
    assert(out == """<p title="a&quot;b">x &lt; y</p>""")
  }

  test("removeWhere / removeComments") {
    val doc = Html.parse("""<div><nav>n</nav><!--c--><p>keep</p></div>""")
    Html.removeWhere(doc)(_.tag == "nav")
    Html.removeComments(doc)
    assert(Html.render(doc) == "<div><p>keep</p></div>")
  }
}

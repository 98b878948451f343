package graft
object KernelBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("threads")) { threadScaling(); return }
    val rows = (0 until 200).map(i => graft.fixtures.SiteGen.wideRow(42L, i.toLong, 1562, 64, 16, 60))
    // warmup
    rows.take(50).foreach(r => graft.core.Extractor.extract(r.url, new String(r.html, "UTF-8")))
    val t0 = System.nanoTime()
    var n = 0
    rows.foreach { r => graft.core.Extractor.extract(r.url, new String(r.html, "UTF-8")); n += 1 }
    val ms = (System.nanoTime() - t0) / 1e6 / n
    println(f"kernel: $ms%.2f ms/page over $n pages")
    // breakdown
    val html = new String(rows(7).html, "UTF-8")
    def time(tag: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); var i = 0; while (i < 100) { f; i += 1 }
      println(f"$tag: ${(System.nanoTime() - t) / 1e6 / 100}%.2f ms")
    }
    time("parse")(graft.core.Html.parse(html))
    val doc = graft.core.Html.parse(html)
    time("clean")(graft.core.Cleaner.transformHtml(doc, rows(7).url))
    val cleaned = graft.core.Cleaner.transformHtml(doc, rows(7).url)
    time("markdown")(graft.core.Markdown.fromHtml(cleaned))
    time("text")(graft.core.TextExtract.fromHtml(html))
    val md = graft.core.Markdown.fromHtml(cleaned)
    time("md-postprocess")(graft.core.Markdown.postprocess(md))
  }

  /** Spark-free kernel thread-scaling: the socket's DRAM ceiling, measured
    * without any orchestration. */
  def threadScaling(): Unit = {
    val rows = (0 until 2000).map(i => graft.fixtures.SiteGen.wideRow(42L, i.toLong, 1562, 64, 16, 60))
    val htmls = rows.map(r => (r.url, new String(r.html, "UTF-8"))).toArray
    // warmup: multi-threaded so JIT sees the concurrent profile before any
    // measured point
    (0 until 8).map { t =>
      new Thread(() => htmls.slice(t * 150, (t + 1) * 150).foreach { case (u, h) =>
        graft.core.Extractor.extract(u, h) })
    }.map { th => th.start(); th }.foreach(_.join())
    for (t <- Seq(1, 2, 4, 8, 16, 32)) {
      val per = htmls.length
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val threads = (0 until t).map { _ =>
        new Thread(() => {
          var i = counter.getAndIncrement()
          while (i < per) {
            val (u, h) = htmls(i)
            graft.core.Extractor.extract(u, h)
            i = counter.getAndIncrement()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"threads=$t%2d pages/s=${per / secs}%.0f")
    }
  }
}

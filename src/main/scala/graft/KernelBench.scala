package graft
object KernelBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("threads")) { threadScaling(2000); return }
    // DRAM-streaming variant: ~20k pages (~1 GB incl. UTF-16 strings) so the
    // working set cannot sit in L3. The 2000-page mode measures the CPU/cache
    // roofline; this mode measures the memory-bandwidth roofline — the one
    // the engine's wide generations actually hit (and the one a contended
    // host degrades first; see BENCH.md's 2026-08-18 disclosure).
    if (args.headOption.contains("threads-wide")) { threadScaling(20000); return }
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

  /** Spark-free kernel thread-scaling: the socket's ceiling, measured
    * without any orchestration. `pages`=2000 fits L3 (CPU roofline);
    * `pages`=20000 streams DRAM (bandwidth roofline). */
  def threadScaling(pages: Int): Unit = {
    val htmls = new Array[(String, String)](pages)
    val genThreads = (0 until 8).map { t =>
      new Thread(() => {
        var i = t
        while (i < pages) {
          // constant generator params: page i's bytes are identical across
          // modes, so 2000-page numbers stay comparable with prior rounds
          val r = graft.fixtures.SiteGen.wideRow(42L, i.toLong, 1562, 64, 16, 60)
          htmls(i) = (r.url, new String(r.html, "UTF-8"))
          i += 8
        }
      })
    }
    genThreads.foreach(_.start()); genThreads.foreach(_.join())
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

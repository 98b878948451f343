package graft.pipeline

import graft.core.{Html, LinkExtractor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Anchor-text aggregation — the web-graph operator that turns out-links
 * into per-TARGET evidence: which terms does the web use when linking to a
 * URL. Feeds search ranking (anchor terms are the classic off-page signal
 * the reference's SERP side consumes) and crawl prioritization (targets
 * with rich anchor evidence are fetched first).
 *
 * Link semantics match the crawl path's LinkExtractor (Crawlee
 * `enqueueLinks`, reference Base.ts:362-403): `a[href]` in document order,
 * fragment/javascript/mailto/tel skipped, hrefs resolved against the page
 * URL with the reference's malformed-scheme repair, non-http(s) dropped.
 * Unlike frontier expansion there is NO per-page target dedup — every
 * anchor occurrence is evidence — and the anchor's text content is kept.
 * Terms are the q13/q54 tokenizer contract: UTF8String lowercasing
 * (byte-identical to the `lower()` Column, so SQL oracles replay it),
 * ASCII-whitespace split, empties dropped.
 *
 * Shape for 100 TB: the naive plan is groupBy(target, term) [exchange 1,
 * map-side combine] followed by a per-target rank window [exchange 2
 * carrying the whole aggregated index]. This operator instead combines in
 * the kernel — a size-capped (target, term) -> count hash map per task,
 * flushed whenever it exceeds `combinerCap` entries (bounded memory at any
 * partition width; downstream sums make early flushes harmless) — and ships
 * ONE target-keyed exchange. The final count aggregate and the top-K window
 * both run on that exchange without further shuffles: HashPartitioning on
 * `target` satisfies the aggregate's ClusteredDistribution(target, term)
 * (partitioning on a prefix of the grouping keys) and the window's
 * ClusteredDistribution(target). Skew note: a 10^9-inlink target
 * concentrates its rows on one partition, but what arrives there is
 * per-task-combined (target, term) partials — bounded by tasks x anchor
 * vocabulary, never one row per inlink occurrence.
 */
object Anchors {

  /** (resolvedTargetUrl, anchorText) pairs of one page, document order,
    * every occurrence kept. Skip rules, repair, and scheme gate are
    * [[graft.core.LinkExtractor.occurrences]] — the same definition the
    * frontier uses, so anchor evidence can never diverge from crawl links. */
  def pageAnchors(html: String, baseUrl: String): Seq[(String, String)] =
    LinkExtractor.occurrences(Html.parse(html), baseUrl)
      .map { case (abs, a) => (abs, a.text) }

  /** Anchor terms of one page as combined ((target, term), count) partials. */
  private def pageTermCounts(html: String, baseUrl: String)
      : Iterator[((String, String), Long)] = {
    val m = new java.util.HashMap[(String, String), Long]()
    pageAnchors(html, baseUrl).foreach { case (target, text) =>
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
      for (t <- lowered.split("\\s+") if t.nonEmpty)
        m.merge((target, t), 1L, (a, b) => a + b)
    }
    import scala.jdk.CollectionConverters._
    m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
  }

  /** Per target: anchor-term counts and the top-`k` terms by count (ties
    * term ascending — a total order, deterministic at any parallelism).
    * Output (target, term, cnt, rn), rn in [1, k].
    *
    * `combinerCap` bounds the per-task combiner map; the default flushes at
    * 1 << 16 entries (~a few MB), far below executor memory at any width.
    *
    * `sorted` (default true) appends a global (target, rn) ordering — a
    * second, range-partitioning exchange over the aggregated index, wanted
    * only for deterministic output/oracles. Production at scale passes
    * false and keeps the operator at its ONE target-keyed exchange. */
  def topTerms(pages: DataFrame, urlCol: String, htmlCol: String, k: Int,
               combinerCap: Int = 1 << 16, sorted: Boolean = true): DataFrame = {
    require(k > 0, "k must be positive")
    require(combinerCap > 0, "combinerCap must be positive")
    val spark = pages.sparkSession
    import spark.implicits._
    val combined = pages
      .select(col(urlCol).cast("string"), col(htmlCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { rows =>
        // size-capped combiner: correctness does not depend on the cap (the
        // final aggregate re-sums), only memory does
        val m = new java.util.HashMap[(String, String), Long]()
        def drain(): Iterator[((String, String), Long)] = {
          import scala.jdk.CollectionConverters._
          val snap = m.entrySet().asScala
            .map(e => (e.getKey, e.getValue)).toVector
          m.clear()
          snap.iterator
        }
        val main = rows.flatMap { case (u, h) =>
          if (u == null || h == null) Iterator.empty
          else {
            pageTermCounts(h, u).foreach { case (key, c) =>
              m.merge(key, c, (a: Long, b: Long) => a + b)
            }
            if (m.size > combinerCap) drain() else Iterator.empty
          }
        }
        // Iterator.++ takes its operand by name: drain() runs only after
        // `main` is exhausted — the leftover entries flush exactly once
        main ++ drain()
      }
      .map { case ((target, term), c) => (target, term, c) }
      .toDF("target", "term", "cnt")

    val w = Window.partitionBy(col("target"))
      .orderBy(col("cnt").desc, col("term").asc)
    val ranked = combined
      .repartition(col("target")) // the ONE exchange of this operator
      .groupBy(col("target"), col("term"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
    if (sorted) ranked.orderBy(col("target"), col("rn")) else ranked
  }
}

package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Crawler-trap detection by URL-template mining — the frontier-hygiene
 * operator every 10^10-URL crawl needs: hosts that generate unbounded URL
 * families (calendar pages, session ids, faceted-search permutations) will
 * happily absorb the whole crawl budget unless the scheduler can see that
 * one path TEMPLATE is exploding. Production crawlers ship exactly this
 * guard (Heritrix's pathological-path rule; the reference bounds the damage
 * only indirectly via max_depth P5 and limit P6 — this operator is additive
 * surface beyond it).
 *
 * A template is the URL path with volatile runs collapsed: long hex runs
 * (>= 8 chars — ids, session tokens, digests) become `~x` first, then digit
 * runs become `~d`; the query string never participates (its values are the
 * classic trap axis). A (host, template) family is flagged when it has at
 * least `minUrls` members AND holds at least `minShareMilli` of the host's
 * frontier (integer milli-share — no floats, so verdicts are bit-stable).
 *
 * Scale shape: template/host derivation is a pure codegen regexp projection
 * over the scan (no kernel, no UDF). ONE host-keyed exchange serves
 * everything downstream: HashPartitioning(host) satisfies the
 * (host, template) aggregate's clustering (partitioning on a prefix of the
 * grouping keys, the q57 shape) and the host-total window runs on the SAME
 * partitioning over the already-aggregated rows — per-host row count after
 * aggregation is the host's template count, thousands at worst, so the
 * window never buffers raw frontier rows. Verdict rows are O(distinct
 * templates), not O(frontier).
 */
object Traps {

  private val HostRe = java.util.regex.Pattern.compile("^[a-z]+://([^/?#]+)")
  private val PathRe = java.util.regex.Pattern.compile("^[a-z]+://[^/?#]+([^?#]*)")
  private val HexRun = java.util.regex.Pattern.compile("[0-9a-fA-F]{8,}")
  private val DigitRun = java.util.regex.Pattern.compile("[0-9]+")

  /** Kernel-side [[hostCol]] (same regex; spec-pinned equal) for row-by-row
    * gating inside mapPartitions passes — the crawl engine's trap gate. */
  def host(url: String): String = {
    val m = HostRe.matcher(url)
    if (m.find()) m.group(1) else ""
  }

  /** Kernel-side [[templateCol]] (same regexes, same order; spec-pinned). */
  def template(url: String): String = {
    val m = PathRe.matcher(url)
    val path = if (m.find()) m.group(1) else ""
    DigitRun.matcher(HexRun.matcher(path).replaceAll("~x")).replaceAll("~d")
  }

  /** Trap-gate family key from already-derived parts — the ONE encoding
    * (U+001F-joined) shared by the candidate gate, the refresh side, and
    * the specs; a drifted copy would make gate lookups silently miss. */
  def familyKey(jobId: String, host: String, template: String): String =
    jobId + 31.toChar + host + 31.toChar + template

  /** Trap-gate family key of a normalized URL within a job. */
  def familyKey(jobId: String, normUrl: String): String =
    familyKey(jobId, host(normUrl), template(normUrl))

  /** Host of an absolute URL (scheme-mandatory — frontier URLs are already
    * UrlOps-normalized upstream). */
  def hostCol(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/?#]+)", 1)

  /** Path template: query/fragment dropped, hex runs >= 8 (EITHER case —
    * normalize lowercases only scheme/host, so uppercase session ids and
    * GUIDs survive in paths) -> `~x` before digits, which would split them;
    * digit runs -> `~d`. */
  def templateCol(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(url, "^[a-z]+://[^/?#]+([^?#]*)", 1),
        "[0-9a-fA-F]{8,}", "~x"),
      "[0-9]+", "~d")

  /** Per (host, template): member count, host total, integer milli-share,
    * and the trap verdict. `sorted` (default true) orders by
    * (host, template) for oracle determinism; production at scale passes
    * false and skips the range exchange. */
  def detect(urls: DataFrame, urlCol: String, minUrls: Long,
      minShareMilli: Long, sorted: Boolean = true): DataFrame = {
    require(minUrls >= 1, "minUrls must be >= 1")
    require(minShareMilli >= 0 && minShareMilli <= 1000,
      "minShareMilli must be in [0, 1000]")
    val u = col(urlCol).cast("string")
    val byTemplate = urls
      .select(hostCol(u).as("host"), templateCol(u).as("template"))
      .repartition(col("host")) // the ONE exchange of this operator
      .groupBy(col("host"), col("template"))
      .agg(count(lit(1)).as("urls"))
    val out = byTemplate
      .withColumn("host_urls",
        sum(col("urls")).over(Window.partitionBy(col("host"))))
      .select(col("host"), col("template"), col("urls"), col("host_urls"),
        expr("(urls * 1000) div host_urls").as("share_milli"),
        (col("urls") >= minUrls &&
          col("urls") * 1000 >= lit(minShareMilli) * col("host_urls"))
          .as("trap"))
    if (sorted) out.orderBy(col("host"), col("template")) else out
  }
}

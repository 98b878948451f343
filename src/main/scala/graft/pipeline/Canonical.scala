package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Html, UrlOps}

/**
 * Canonical-URL alias clustering — `<link rel="canonical">` as a dedup key.
 *
 * The reference exposes page metadata (including whatever `<link>` tags say)
 * but leaves alias resolution to the consumer; at training-data scale the
 * canonical link is the cheapest dedup signal there is: CMSes serve the same
 * article under tracking-parameter, pagination, and mirror URLs, and every
 * variant declares the same canonical target. Clustering by declared
 * canonical collapses those aliases BEFORE any content hashing runs —
 * upstream of [[Dedup]], at one parse per page plus one key shuffle, versus
 * minhashing every alias copy.
 *
 * Per page: parse the HTML (same [[graft.core.Html]] parser the extraction
 * kernel uses), take the FIRST `<link rel=canonical href=...>` (rel
 * compared ASCII-case-insensitively per the HTML spec), resolve the href
 * against the page URL ([[UrlOps.resolve]] — relative canonicals are
 * common), and normalize ([[UrlOps.normalize]]). Pages without a usable
 * canonical link are their own canonical (the spec's default).
 *
 * Cluster representative (`keep`): the member whose normalized URL equals
 * the canonical target — the canonical page itself — when the crawl
 * captured it; otherwise (target outside the crawl) the lexicographically
 * smallest member, so exactly one row per cluster is kept and the choice is
 * deterministic under any partitioning.
 *
 * Scale shape: one kernel scan (parse + resolve, no shuffle), then ONE
 * hash shuffle on the canonical key (groupBy + join back). No driver-side
 * state; cluster skew (a mega-site declaring one canonical for millions of
 * pages) degrades to one large shuffle partition, which AQE splits.
 */
object Canonical {

  /** Extracted canonical target of one page, before clustering. */
  def canonicalOf(url: String, html: String): String = {
    val self = UrlOps.normalize(url)
    val doc = Html.parse(html)
    val link = Html.select(doc, "link").find { e =>
      e.attr("rel").exists(_.trim.equalsIgnoreCase("canonical")) &&
        e.attr("href").exists(_.trim.nonEmpty)
    }
    link.flatMap(_.attr("href")).map(_.trim) match {
      case Some(href) =>
        UrlOps.resolveOpt(url, href).map(UrlOps.normalize).getOrElse(self)
      case None => self
    }
  }

  /** Cluster pages by declared canonical target.
    *
    * @return one row per input page:
    *         (url, canonical, cluster_size, keep) — `url` normalized,
    *         `keep` true for exactly one member per cluster
    */
  def clusters(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val spark = pages.sparkSession
    val schema = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("canonical", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // checkpoint-rooted so the parse kernel runs ONCE and feeds both the
    // cluster aggregate and the member join (without it Catalyst duplicates
    // the kernel subtree into each side of the self-join — the q18
    // signature-cache lesson)
    val extracted = pages
      .select(col(urlCol).cast("string").as("u"), col(htmlCol).cast("string").as("h"))
      .mapPartitions { it =>
        it.map { r =>
          val u = r.getString(0)
          Row(UrlOps.normalize(u), canonicalOf(u, if (r.isNullAt(1)) "" else r.getString(1)))
        }
      }(enc)
      .transform(Checkpoints.step)

    val agg = extracted.groupBy(col("canonical").as("c"))
      .agg(
        count(lit(1)).as("cluster_size"),
        min(when(col("url") === col("canonical"), col("url"))).as("self_rep"),
        min(col("url")).as("min_url"))
    extracted.join(agg, extracted("canonical") === agg("c"))
      .select(
        col("url"), col("canonical"), col("cluster_size"),
        (col("url") === coalesce(col("self_rep"), col("min_url"))).as("keep"))
  }
}

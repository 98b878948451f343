package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CanonicalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("canonical-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("canonicalOf: first canonical link wins, rel case-insensitive, " +
      "relative href resolved, absent/unusable falls back to self") {
    val u = "https://site.test/a/page?x=1"
    assert(Canonical.canonicalOf(u,
      """<html><head><link rel="canonical" href="/canon"></head></html>""")
      == "https://site.test/canon")
    assert(Canonical.canonicalOf(u,
      """<head><link rel="CANONICAL" href="https://other.test/c"></head>""")
      == "https://other.test/c")
    // relative (not root-relative) resolves against the page directory
    assert(Canonical.canonicalOf(u,
      """<head><link rel="canonical" href="c2"></head>""")
      == "https://site.test/a/c2")
    // first matching link wins
    assert(Canonical.canonicalOf(u,
      """<head><link rel="canonical" href="/one"><link rel="canonical" href="/two"></head>""")
      == "https://site.test/one")
    // no canonical link / empty href / stylesheet rel -> self (normalized)
    val self = graft.core.UrlOps.normalize(u)
    assert(Canonical.canonicalOf(u, "<html><body>x</body></html>") == self)
    assert(Canonical.canonicalOf(u,
      """<head><link rel="canonical" href=""></head>""") == self)
    assert(Canonical.canonicalOf(u,
      """<head><link rel="stylesheet" href="/s.css"></head>""") == self)
  }

  test("clusters: aliases group under the declared target, the canonical " +
      "page represents its cluster, external targets fall back to min url") {
    val pages = Seq(
      // cluster at /main: the canonical page itself + two aliases
      ("https://s.test/main", "<head></head>"),
      ("https://s.test/main?utm=1", """<head><link rel="canonical" href="/main"></head>"""),
      ("https://s.test/amp/main", """<head><link rel="canonical" href="https://s.test/main"></head>"""),
      // external canonical: target not in the crawl -> min member keeps
      ("https://s.test/m2", """<head><link rel="canonical" href="https://cdn.test/x"></head>"""),
      ("https://s.test/m1", """<head><link rel="canonical" href="https://cdn.test/x"></head>""")
    ).toDF("url", "html")
    val out = Canonical.clusters(pages, "url", "html")
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out("https://s.test/main") == (("https://s.test/main", 3L, true)))
    assert(out("https://s.test/main?utm=1") == (("https://s.test/main", 3L, false)))
    assert(out("https://s.test/amp/main") == (("https://s.test/main", 3L, false)))
    assert(out("https://s.test/m1") == (("https://cdn.test/x", 2L, true)))
    assert(out("https://s.test/m2") == (("https://cdn.test/x", 2L, false)))
    // exactly one keeper per cluster
    val keepers = out.values.groupBy(_._1).map { case (c, ms) => c -> ms.count(_._3) }
    assert(keepers.values.forall(_ == 1))
  }
}

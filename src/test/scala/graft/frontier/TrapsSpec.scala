package graft.frontier

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TrapsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("traps-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def parsed(url: String): (String, String) = {
    val r = Seq(url).toDF("u")
      .select(Traps.hostCol(col("u")), Traps.templateCol(col("u")))
      .collect()(0)
    (r.getString(0), r.getString(1))
  }

  test("host/template extraction: hex-before-digit collapse, query and " +
      "fragment dropped, port kept in host, empty path") {
    assert(parsed("https://a.test/cal/2024/11/30") == ("a.test", "/cal/~d/~d/~d"))
    assert(parsed("https://a.test/s/deadbeef42/x") == ("a.test", "/s/~x/x"))
    assert(parsed("https://a.test/p7/view?sess=abc123#frag") == ("a.test", "/p~d/view"))
    assert(parsed("http://b.test:8080/faq") == ("b.test:8080", "/faq"))
    assert(parsed("https://c.test") == ("c.test", ""))
    // 7 hex chars stay (below the >= 8 id threshold); the digits collapse
    assert(parsed("https://a.test/t/abc12de") == ("a.test", "/t/abc~dde"))
    // uppercase/mixed-case hex collapses too: normalize lowercases only
    // scheme and host, so session ids/GUIDs keep their case in paths
    assert(parsed("https://a.test/s/A3F9C2D8B1E47766") == ("a.test", "/s/~x"))
    assert(parsed("https://a.test/g/DeadBeef42/x") == ("a.test", "/g/~x/x"))
  }

  test("detect: an exploding template on one host is flagged; a diverse " +
      "host is not; share boundary is >= (integer cross-multiply)") {
    val urls =
      (0 until 30).map(i => s"https://trap.test/cal/2024/$i") ++ // one family
        (0 until 10).flatMap(i => Seq(
          s"https://ok.test/about", s"https://ok.test/item/$i",
          s"https://ok.test/tag/news")) // three ~equal families
    val got = Traps.detect(urls.toDF("url"), "url",
        minUrls = 10, minShareMilli = 300)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == Seq(
      ("ok.test", "/about", 10L, 30L, 333L, true), // 10*1000 >= 300*30: boundary+
      ("ok.test", "/item/~d", 10L, 30L, 333L, true),
      ("ok.test", "/tag/news", 10L, 30L, 333L, true),
      ("trap.test", "/cal/~d/~d", 30L, 30L, 1000L, true)))
    // raising the share bar to 400 milli clears the diverse host
    val strict = Traps.detect(urls.toDF("url"), "url", 10, 400)
      .collect().map(r => (r.getString(0), r.getBoolean(5))).toSeq
    assert(strict == Seq(("ok.test", false), ("ok.test", false),
      ("ok.test", false), ("trap.test", true)))
  }

  test("kernel-side host/template (the engine trap gate's path) equal the " +
      "Column versions byte-for-byte") {
    val urls = Seq(
      "https://a.test/cal/2024/11", "https://b.test:8080/s/deadbeef42/x?q=1#f",
      "https://c.test", "http://d.test/abc12de/", "https://e.test/p7/view?s=1")
    val viaCol = urls.toDF("u")
      .select(Traps.hostCol(col("u")), Traps.templateCol(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(viaCol == urls.map(u => (Traps.host(u), Traps.template(u))))
  }

  test("verdicts are invariant to input partitioning") {
    val urls = (0 until 200).map(i =>
      s"https://h${i % 5}.test/${if (i % 3 == 0) s"cal/$i" else s"page$i"}")
    def at(parts: Int) = Traps.detect(
      urls.toDF("url").repartition(parts), "url", 5, 250)
      .collect().map(_.toSeq).toSeq
    assert(at(1) == at(7))
  }

  test("plan shape: one hash exchange serves the aggregate AND the " +
      "host-total window (no second hash exchange)") {
    val urls = (0 until 50).map(i => s"https://h${i % 3}.test/p/$i")
    val plan = Traps.detect(urls.toDF("url"), "url", 5, 100, sorted = false)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashExchanges == 1, s"expected exactly one hash exchange:\n$plan")
  }
}

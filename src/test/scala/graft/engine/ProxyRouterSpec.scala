package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

class ProxyRouterSpec extends AnyFunSuite {
  import ProxyRouter._

  private val rules = Seq(
    ProxyRule(url = Some("https://api.example.test/v1/data"), proxy = "http://proxy1:8080"),
    ProxyRule(domain = Some("*.gov.test"), proxy = "http://proxy2:8080"),
    ProxyRule(pattern = Some("https://*.github.test/api/*"), proxy = "http://proxy3:8080"))
  private val r = new Rules(rules)

  test("rule priority: in-order scan, url > pattern > domain within a rule (Proxy.ts:530-563)") {
    assert(r.proxyFor("https://api.example.test/v1/data").contains("http://proxy1:8080"))
    assert(r.proxyFor("https://data.gov.test/x").contains("http://proxy2:8080"))
    assert(r.proxyFor("https://code.github.test/api/repos").contains("http://proxy3:8080"))
    assert(r.proxyFor("https://plain.example.test/").isEmpty)
    // exact url rule does NOT match a different path on the same host
    assert(r.proxyFor("https://api.example.test/v2/data").isEmpty)
    // earlier rule wins even when a later one also matches
    val overlapping = new Rules(Seq(
      ProxyRule(domain = Some("*.x.test"), proxy = "pA"),
      ProxyRule(pattern = Some("https://a.x.test/*"), proxy = "pB")))
    assert(overlapping.proxyFor("https://a.x.test/p").contains("pA"))
  }

  test("wildcard compilation: * ? escaping, case-insensitive, anchored (Proxy.ts:499-523)") {
    assert(compileWildcard("*.example.com").matcher("SUB.EXAMPLE.COM").matches())
    assert(!compileWildcard("*.example.com").matcher("example.com").matches())
    assert(compileWildcard("a?c").matcher("abc").matches())
    assert(!compileWildcard("a?c").matcher("abbc").matches())
    // '.' is literal, not any-char
    assert(!compileWildcard("a.c").matcher("aXc").matches())
    assert(r.proxyFor("not a url").isEmpty) // invalid url: no domain match
  }

  test("config JSON parse + proxy column over a frontier (broadcast, no shuffle)") {
    val json = """{"rules": [
      {"url": "https://api.example.test/v1/data", "proxy": "http://proxy1:8080"},
      {"domain": "*.gov.test", "proxy": "http://proxy2:8080"},
      {"pattern": "https://*.github.test/api/*", "proxy": "http://proxy3:8080"}
    ]}"""
    assert(ProxyRouter.parseConfig(json) == rules)
    assert(ProxyRouter.parseConfig("nope").isEmpty)

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val urls = Seq("https://api.example.test/v1/data", "https://x.gov.test/a",
      "https://nothing.test/").toDF("url")
    val withProxy = urls.withColumn("proxy", ProxyRouter.proxyColumn(spark, rules)(col("url")))
    val got = withProxy.collect().map(row => Option(row.getAs[String]("proxy"))).toSeq
    assert(got == Seq(Some("http://proxy1:8080"), Some("http://proxy2:8080"), None))
  }
}

package graft.frontier

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RedirectsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("redirects-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def resolve(edges: Seq[(String, String)], maxHops: Int = 32):
      Map[String, (Option[String], Option[Int], Boolean)] =
    Redirects.resolve(edges.toDF("src", "dst"), "src", "dst", maxHops)
      .collect()
      .map { r =>
        r.getString(0) -> (
          Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getBoolean(3))
      }.toMap

  test("simple chain resolves to the terminal with exact hop counts") {
    val out = resolve(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(out("a") == (Some("d"), Some(3), false))
    assert(out("b") == (Some("d"), Some(2), false))
    assert(out("c") == (Some("d"), Some(1), false))
    assert(out.size == 3)
  }

  test("two-cycle and rho (tail feeding a cycle) are flagged, chains near " +
      "them still resolve") {
    //  t1 -> t2 -> x <-> y   (rho: tails into the 2-cycle)
    //  ok -> done            (independent chain)
    val out = resolve(Seq(
      "t1" -> "t2", "t2" -> "x", "x" -> "y", "y" -> "x", "ok" -> "done"))
    assert(out("x") == (None, None, true))
    assert(out("y") == (None, None, true))
    assert(out("t1") == (None, None, true))
    assert(out("t2") == (None, None, true))
    assert(out("ok") == (Some("done"), Some(1), false))
  }

  test("chains longer than maxHops are flagged as unresolvable") {
    // 0 -> 1 -> ... -> 40 (length 40)
    val edges = (0 until 40).map(i => s"u$i" -> s"u${i + 1}")
    val out = resolve(edges, maxHops = 32)
    // head is 40 hops from the terminal: over budget
    assert(out("u0") == (None, None, true))
    // u8 is exactly 32 hops out: resolves at the budget boundary
    assert(out("u8") == (Some("u40"), Some(32), false))
    assert(out("u7") == (None, None, true))
    assert(out("u39") == (Some("u40"), Some(1), false))
  }

  test("duplicate sources take the lexicographically smallest target; " +
      "self-redirects are dropped") {
    val out = resolve(Seq("a" -> "z", "a" -> "b", "b" -> "c", "s" -> "s"))
    // a's min(dst) = "b", so a -> b -> c
    assert(out("a") == (Some("c"), Some(2), false))
    assert(!out.contains("s"))
  }

  test("matches a sequential walk oracle on a pseudo-random functional graph") {
    // deterministic functional graph over 400 nodes: node i redirects to
    // mix(i) % 500 when mix(i) % 3 != 0 (so ~1/3 of nodes are terminals
    // and targets can fall outside the source domain)
    def mix(i: Long): Long = {
      var z = i * 0x9E3779B97F4A7C15L + 0x243F6A8885A308D3L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z ^ (z >>> 31)
    }
    val edges = (0L until 400L).flatMap { i =>
      val h = mix(i)
      if (math.floorMod(h, 3L) != 0L)
        Some(s"n$i" -> s"n${math.floorMod(h >> 8, 500L)}")
      else None
    }.filter { case (s, d) => s != d }
    val next = edges.toMap // sources are unique by construction
    val maxHops = 32
    def walk(u: String): (Option[String], Option[Int], Boolean) = {
      var cur = next(u)
      var hops = 1
      while (next.contains(cur) && hops <= maxHops) { cur = next(cur); hops += 1 }
      if (!next.contains(cur) && hops <= maxHops) (Some(cur), Some(hops), false)
      else (None, None, true)
    }
    val expected = next.keys.map(u => u -> walk(u)).toMap
    assert(resolve(edges, maxHops) == expected)
  }
}

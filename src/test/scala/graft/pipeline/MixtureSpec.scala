package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixtureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("mixture-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def got(rows: Seq[(String, Long)], weights: Map[String, Long]) = {
    val docs = rows.toDF("source", "ntok")
    Mixture.plan(docs, "source", col("ntok"), weights).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
  }

  test("feasible total is bound by the scarcest source; takes respect weights") {
    // a: 1000 tokens w=1, b: 100 tokens w=1 -> W=2, N* = min(2000, 200) = 200
    // take_a = 100, take_b = 100
    val res = got(Seq(("a", 1000L), ("b", 100L)), Map("a" -> 1L, "b" -> 1L))
    assert(res == Seq(
      ("a", 1000L, 1L, 100L, 100L, 900L),
      ("b", 100L, 1L, 100L, 1000L, 0L)))
  }

  test("weighted mixture: heavier source binds later, floors are exact") {
    // a: 300 w=3, b: 500 w=1 -> W=4, N* = min(300*4/3, 500*4/1) = min(400, 2000) = 400
    // take_a = 400*3/4 = 300 (all of a), take_b = 100
    val res = got(Seq(("a", 300L), ("b", 500L)), Map("a" -> 3L, "b" -> 1L))
    assert(res == Seq(
      ("a", 300L, 3L, 300L, 1000L, 0L),
      ("b", 500L, 1L, 100L, 200L, 400L)))
  }

  test("take never exceeds availability under adversarial flooring") {
    for (ta <- 1L to 40L; tb <- 1L to 13L) {
      val res = got(Seq(("a", ta), ("b", tb)), Map("a" -> 5L, "b" -> 2L))
      res.foreach { case (_, avail, _, take, rate, surplus) =>
        assert(take <= avail); assert(surplus == avail - take)
        assert(rate >= 0L && rate <= 1000L)
      }
    }
  }

  test("zero-weight and absent sources are excluded; weighted-but-missing is ignored") {
    val res = got(Seq(("a", 100L), ("z", 999L)),
      Map("a" -> 1L, "z" -> 0L, "ghost" -> 7L))
    assert(res.map(_._1) == Seq("a"))
    assert(res.head._4 == 100L) // W collapses to a's weight alone
  }

  test("per-source totals aggregate multiple rows") {
    val res = got(Seq(("a", 30L), ("a", 70L), ("b", 50L)),
      Map("a" -> 1L, "b" -> 1L))
    assert(res.map(r => (r._1, r._2)) == Seq(("a", 100L), ("b", 50L)))
  }

  test("empty active set yields an empty plan") {
    assert(got(Seq(("a", 10L)), Map("b" -> 1L)).isEmpty)
  }
}

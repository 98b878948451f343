package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("vocab-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("docTokenCounts: lowercased distinct tokens with in-doc counts") {
    val got = Vocab.docTokenCounts("The the THE  cat\tsat on the mat").toMap
    assert(got == Map("the" -> 4L, "cat" -> 1L, "sat" -> 1L,
      "on" -> 1L, "mat" -> 1L))
    assert(Vocab.docTokenCounts("   ").toMap == Map.empty)
  }

  test("topK: tf sums occurrences, df counts documents, ties break by token") {
    val docs = Seq(
      (0L, "a a a b"),    // a:3, b:1
      (1L, "a b c"),      // a,b,c
      (2L, "b c c"),      // b, c:2
      (3L, Option.empty[String].orNull)) // null contributes nothing
    val got = Vocab.topK(docs.toDF("id", "text"), "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // tf: a=4, c=3, b=3 -> order: a(4), b(3) before c(3) by token asc
    assert(got == Seq(("a", 4L, 2L), ("b", 3L, 3L), ("c", 3L, 2L)))
  }

  test("k truncates after the deterministic order") {
    val docs = Seq((0L, "x y z"), (1L, "x y"), (2L, "x"))
    val got = Vocab.topK(docs.toDF("id", "text"), "text", 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("x", "y"))
  }

  test("result is invariant to input partitioning") {
    val docs = (0L until 200L).map(i => (i, s"tok${i % 13} tok${i % 7} common"))
    val a = Vocab.topK(docs.toDF("id", "text"), "text", 25).collect().toSeq
    val b = Vocab.topK(docs.toDF("id", "text").repartition(7), "text", 25)
      .collect().toSeq
    assert(a == b && a.head.getString(0) == "common" && a.head.getLong(1) == 200L)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val docs = (0L until 50L).map(i => (i, s"w$i common")).toDF("id", "text")
    val plan = Vocab.topK(docs, "text", 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}

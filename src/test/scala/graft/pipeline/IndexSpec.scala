package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class IndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("index-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def bk(k: Int) = new Index.BottomKLongs(k)

  test("BottomKLongs.reduce keeps a sorted bottom-k buffer") {
    val a = bk(3)
    val got = Seq(5L, 1L, 9L, 3L, 2L).foldLeft(a.zero)(a.reduce)
    assert(got.toSeq == Seq(1L, 2L, 3L))
    // below capacity: all elements, sorted
    val b = bk(8)
    val got2 = Seq(5L, 1L, 9L).foldLeft(b.zero)(b.reduce)
    assert(got2.toSeq == Seq(1L, 5L, 9L))
    // an element >= current max of a full buffer is a no-op (same array back)
    val full = Seq(1L, 2L, 3L).foldLeft(a.zero)(a.reduce)
    assert(a.reduce(full, 7L) eq full)
  }

  test("BottomKLongs.merge keeps the k smallest of the union, sorted") {
    val a = bk(4)
    val b1 = Seq(1L, 4L, 9L).foldLeft(a.zero)(a.reduce)
    val b2 = Seq(2L, 3L, 8L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(b1, b2).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(a.merge(a.zero, b1).toSeq == b1.toSeq)
    assert(a.merge(b2, a.zero).toSeq == b2.toSeq)
  }

  test("postings: df counts docs, tf sums occurrences, ids are bottom-k") {
    val docs = Seq(
      (0L, "a a b"),   // a:2, b:1
      (1L, "a c"),
      (2L, "b c c"),
      (3L, Option.empty[String].orNull)) // null contributes nothing
      .toDF("doc_id", "text")
    val got = Index.postings(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      ("a", 2L, 3L, "0,1"),
      ("b", 2L, 2L, "0,2"),
      ("c", 2L, 3L, "1,2")))
  }

  test("cap bounds the posting list under term skew") {
    // every doc contains the stopword; the buffer must never exceed cap
    val docs = (0L until 300L).map(i => (i, s"the w$i")).toDF("doc_id", "text")
    val got = Index.postings(docs, "doc_id", "text", minDf = 1, cap = 8)
      .filter($"token" === "the").collect().head
    assert(got.getLong(1) == 300L && got.getLong(2) == 300L)
    assert(got.getString(3) == (0L until 8L).mkString(","))
  }

  test("null doc_id or null text rows contribute nothing") {
    val docs = Seq((Some(0L), Some("a b")), (None, Some("a")),
      (Some(1L), Option.empty[String])).toDF("doc_id", "text")
    val got = Index.postings(docs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(("a", 1L, 1L, "0"), ("b", 1L, 1L, "0")))
  }

  test("minDf prunes hapax terms") {
    val docs = Seq((0L, "common rare0"), (1L, "common rare1"))
      .toDF("doc_id", "text")
    val got = Index.postings(docs, "doc_id", "text", minDf = 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("common"))
  }

  test("result is invariant to input partitioning") {
    val docs = (0L until 200L)
      .map(i => (i, s"tok${i % 13} tok${i % 7} common common"))
      .toDF("doc_id", "text")
    val a = Index.postings(docs, "doc_id", "text", minDf = 2, cap = 5)
      .collect().toSeq
    val b = Index.postings(docs.repartition(7), "doc_id", "text",
      minDf = 2, cap = 5).collect().toSeq
    assert(a == b)
    val common = a.find(_.getString(0) == "common").get
    assert(common.getLong(1) == 200L && common.getLong(2) == 400L &&
      common.getString(3) == "0,1,2,3,4")
  }

  test("plan: one token-keyed hash exchange (partial agg rides the scan)") {
    val docs = (0L until 50L).map(i => (i, s"w$i common")).toDF("doc_id", "text")
    val plan = Index.postings(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val hashExchanges =
      "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"plan:\n$plan")
  }
}

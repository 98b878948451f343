package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RecrawlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("recrawl-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("delta classifies new/changed/unchanged/gone and adapts intervals") {
    val prev = Seq(
      ("u1", "aaa", 100L, 7200L),            // unchanged -> doubles
      ("u2", "bbb", 101L, 7200L),            // changed   -> halves (to floor)
      ("u3", "ccc", 102L, 86400L),           // gone      -> interval kept
      ("u5", "eee", 104L, Recrawl.MaxIntervalSecs), // unchanged at ceiling
      ("u6", "fff", 105L, Recrawl.MinIntervalSecs)  // changed at floor
    ).toDF("url", "h", "ts", "iv")
    val curr = Seq(
      ("u1", "aaa", 200L),
      ("u2", "xxx", 201L),
      ("u4", "ddd", 203L),                   // new
      ("u5", "eee", 204L),
      ("u6", "yyy", 205L)
    ).toDF("url", "h", "ts")
    val out = Recrawl.delta(prev, curr, "url", "h", "ts", Some("iv"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))))
      .toMap
    assert(out("u1") == (("unchanged", Some(100L), Some(200L), 14400L)))
    assert(out("u2") == (("changed", Some(101L), Some(201L), Recrawl.MinIntervalSecs)))
    assert(out("u3") == (("gone", Some(102L), None, 86400L)))
    assert(out("u4") == (("new", None, Some(203L), Recrawl.DefaultIntervalSecs)))
    assert(out("u5") == (("unchanged", Some(104L), Some(204L), Recrawl.MaxIntervalSecs)))
    assert(out("u6") == (("changed", Some(105L), Some(205L), Recrawl.MinIntervalSecs)))
    assert(out.size == 6)
  }

  test("without a carried interval column every URL starts from the default") {
    val prev = Seq(("u1", "aaa", 1L), ("u2", "bbb", 2L)).toDF("url", "h", "ts")
    val curr = Seq(("u1", "aaa", 3L), ("u2", "zzz", 4L)).toDF("url", "h", "ts")
    val out = Recrawl.delta(prev, curr, "url", "h", "ts")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("u1") == Recrawl.DefaultIntervalSecs * 2)
    assert(out("u2") == Recrawl.DefaultIntervalSecs / 2)
  }

  test("null edges: null url rows stay side-attributed; null hashes are null-safe") {
    val prev = Seq(
      (Option("u1"), Option("aaa"), 1L),
      (Option.empty[String], Option("corrupt"), 2L), // null url, prev-only
      (Option("u2"), Option.empty[String], 3L),      // null hash both sides
      (Option("u3"), Option("ccc"), 4L)              // hash goes null in curr
    ).toDF("url", "h", "ts")
    val curr = Seq(
      (Option("u1"), Option("aaa"), 5L),
      (Option("u2"), Option.empty[String], 6L),
      (Option("u3"), Option.empty[String], 7L)
    ).toDF("url", "h", "ts")
    val out = Recrawl.delta(prev, curr, "url", "h", "ts")
      .collect().map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(out(Some("u1")) == "unchanged")
    assert(out(None) == "gone")           // null-url prev row is NOT "new"
    assert(out(Some("u2")) == "unchanged") // null <=> null
    assert(out(Some("u3")) == "changed")   // value vs null
  }

  test("bucketed snapshots co-locate: no hash exchange feeds the full-outer join") {
    import org.apache.spark.sql.functions.col
    val prev = spark.range(200).selectExpr("CAST(id AS STRING) AS url",
      "md5(CAST(id AS STRING)) AS h", "id AS ts")
    val curr = spark.range(100, 300).selectExpr("CAST(id AS STRING) AS url",
      "md5(CAST(id + 1 AS STRING)) AS h", "id AS ts")
    try {
      prev.write.bucketBy(4, "url").sortBy("url").mode("overwrite").saveAsTable("rc_prev")
      curr.write.bucketBy(4, "url").sortBy("url").mode("overwrite").saveAsTable("rc_curr")
      val out = Recrawl.delta(spark.table("rc_prev"), spark.table("rc_curr"),
        "url", "h", "ts")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a join in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed-by-url snapshots must join WITHOUT re-shuffling:\n$plan")
      // and the result is still right: 100 gone, 100 changed-or-unchanged, 100 new
      val counts = out.groupBy(col("status")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("gone") == 100 && counts("new") == 100)
      assert(counts.getOrElse("changed", 0L) + counts.getOrElse("unchanged", 0L) == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS rc_prev")
      spark.sql("DROP TABLE IF EXISTS rc_curr")
    }
  }

  test("self-join lineage (both snapshots derived from one frame) resolves") {
    val base = spark.range(20).selectExpr("CAST(id AS STRING) AS url",
      "md5(CAST(id AS STRING)) AS h", "id AS ts")
    val curr = base.filter($"ts" % 2 === 0)
      .selectExpr("url", "CASE WHEN ts % 4 = 0 THEN h ELSE 'changed' END AS h", "ts + 100 AS ts")
    val out = Recrawl.delta(base, curr, "url", "h", "ts")
      .collect().map(r => (r.getString(0).toLong, r.getString(1)))
    assert(out.length == 20)
    val byId = out.toMap
    assert((0L until 20L).forall { i =>
      byId(i) == (if (i % 2 == 1) "gone" else if (i % 4 == 0) "unchanged" else "changed")
    })
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pack-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("shard assignment matches the sequential prefix-sum on any partitioning") {
    val rows = (0L until 500L).map(i => (i, 1L + (i * 37) % 211))
    var run = 0L
    val want = rows.map { case (id, t) =>
      val off = run; run += t; (id, t, off, off / 1000L)
    }
    for (parts <- Seq(1, 3, 13)) {
      val got = Pack.shardByBudget(rows.toDF("id", "tokens").repartition(7),
          "id", "tokens", budget = 1000L, partitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"partitions=$parts")
    }
  }

  test("no single-partition window: the plan never contains a Window operator") {
    val df = (0L until 100L).map(i => (i, 10L)).toDF("id", "tokens")
    val out = Pack.shardByBudget(df, "id", "tokens", budget = 64L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"windowless global cumsum violated:\n$plan")
    // boundary doc (offset 60, 10 tokens, budget 64) belongs to its START shard
    val m = out.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(m(6L) == 0L && m(7L) == 1L) // doc 6 starts at 60 < 64; doc 7 at 70
  }

  test("downstream coalesce cannot corrupt offsets (parent partition index, not task id)") {
    val rows = (0L until 400L).map(i => (i, 7L))
    val out = Pack.shardByBudget(rows.toDF("id", "tokens").repartition(5),
        "id", "tokens", budget = 100L, partitions = 8)
      .coalesce(1) // pipelines all 8 parent partitions into ONE task
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    rows.foreach { case (id, _) =>
      assert(out(id.toInt) == ((id, id * 7L)), s"id=$id offset under coalesce")
    }
  }

  test("non-integral id/token columns are rejected, null tokens read as 0") {
    val bad = Seq(("a", 1L)).toDF("id", "tokens")
    intercept[IllegalArgumentException] {
      Pack.shardByBudget(bad, "id", "tokens", 10L)
    }
    intercept[IllegalArgumentException] {
      Pack.shardByBudget(Seq((1L, 2.5)).toDF("id", "tokens"), "id", "tokens", 10L)
    }
    val withNull = Seq((1L, Some(3L)), (2L, Option.empty[Long]), (3L, Some(4L)))
      .toDF("id", "tokens")
    val out = Pack.shardByBudget(withNull, "id", "tokens", 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 0L), (2L, 0L, 3L), (3L, 4L, 3L)))
  }

  test("degenerate inputs: empty frame and zero-token docs") {
    assert(Pack.shardByBudget(Seq.empty[(Long, Long)].toDF("id", "tokens"),
      "id", "tokens", 100L).count() == 0)
    val out = Pack.shardByBudget(
        Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("id", "tokens"),
        "id", "tokens", 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 5L, 1L)))
  }

  test("globalRank: exact ranks over (score, id), invariant to partitioning, no Window") {
    val rows = (0L until 500L).map(i => (i, (i * 37) % 101))
    val expected = rows.sortBy { case (id, s) => (s, id) }
      .zipWithIndex.map { case ((id, _), r) => id -> r.toLong }.toMap
    for (parts <- Seq(1, 3, 16)) {
      val ranked = Pack.globalRank(
        rows.toDF("id", "score").repartition(parts), Seq("score", "id"))
      assert(ranked.queryExecution.executedPlan.toString.indexOf("Window") < 0)
      val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expected, s"parts=$parts")
    }
    // empty frame
    assert(Pack.globalRank(Seq.empty[(Long, Long)].toDF("id", "score"),
      Seq("score", "id")).count() == 0)
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class PassageDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("passagededup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int, stride: Int) =
    PassageDedup.verdicts(docs.toDF("doc_id", "text"), "doc_id", "text",
        window, stride, PassageDedup.rawKey)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq

  test("hand-traced verdicts: shared windows keep only the global first " +
      "(doc_id, pos) occurrence") {
    // doc1 windows (w=3): [a b c][b c d][c d e]; doc2 adds a 'z' prefix so
    // every doc1 window recurs one position later
    val got = run(Seq((1L, "a b c d e"), (2L, "z a b c d e")), 3, 1)
    assert(got == Seq(
      (1L, 0L, 2L, true), (1L, 1L, 2L, true), (1L, 2L, 2L, true),
      (2L, 1L, 2L, false), (2L, 2L, 2L, false), (2L, 3L, 2L, false)))
  }

  test("non-shared windows are absent; short and null texts yield nothing") {
    val got = run(Seq((1L, "p q r s"), (2L, "x y"), (3L, null)), 3, 1)
    assert(got.isEmpty)
  }

  test("stride == window: aligned repeats within one doc dedup to the " +
      "first occurrence of each distinct window") {
    val got = run(Seq((7L, "a b c d a b c d")), 2, 2)
    assert(got == Seq(
      (7L, 0L, 2L, true), (7L, 2L, 2L, true),
      (7L, 4L, 2L, false), (7L, 6L, 2L, false)))
  }

  test("verdicts are invariant to input partitioning (total-order keep)") {
    val docs = (0L until 60L).map(i =>
      (i, s"w${i % 4} shared passage tail text w${i % 3}"))
    def at(parts: Int) = PassageDedup.verdicts(
      docs.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
      3, 1, PassageDedup.rawKey).collect().map(_.toSeq).toSeq
    assert(at(1) == at(7))
  }

  test("xxh64Key agrees with rawKey verdicts and with the xxhash64 Column") {
    val docs = (0L until 40L).map(i => (i, s"alpha beta g${i % 5} delta epsilon"))
    val raw = PassageDedup.verdicts(docs.toDF("doc_id", "text"), "doc_id",
      "text", 3, 1, PassageDedup.rawKey).collect().map(_.toSeq).toSeq
    val hashed = PassageDedup.verdicts(docs.toDF("doc_id", "text"), "doc_id",
      "text", 3, 1, PassageDedup.xxh64Key).collect().map(_.toSeq).toSeq
    assert(raw == hashed)
    val s = "alphabetag1"
    val viaCol = Seq(s).toDF("v")
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("v"))).collect()(0).getLong(0)
    assert(PassageDedup.xxh64Key(s) == viaCol)
  }

  test("null id fails loudly; oversized docs and bad params are rejected") {
    val bad = Seq((null.asInstanceOf[java.lang.Long], "a b c d"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      PassageDedup.verdicts(bad, "doc_id", "text", 2, 1,
        PassageDedup.rawKey).collect()
    }
    assert(ex.toString.contains("id") || Option(ex.getCause).exists(
      _.getMessage.contains("id")))
    intercept[IllegalArgumentException] {
      PassageDedup.verdicts(bad, "doc_id", "text", 0, 1, PassageDedup.rawKey)
    }
  }

  test("plan shape: text is scanned once into the checkpoint; stats is a " +
      "partial-combinable aggregate, not a per-key window") {
    val docs = (0L until 30L).map(i => (i, "shared passage text here"))
    val df = PassageDedup.verdicts(docs.toDF("doc_id", "text"), "doc_id",
      "text", 3, 1, PassageDedup.xxh64Key)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no per-key window operator:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate"),
      s"stats must be an aggregate:\n$plan")
  }
}

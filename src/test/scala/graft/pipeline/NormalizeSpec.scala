package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("normalize-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("NFC composes combining sequences") {
    assert(Normalize.fixText("cafe\u0301") == "caf\u00E9")
    assert(Normalize.fixText("A\u030AB") == "\u00C5B")
    // already-composed text is untouched
    assert(Normalize.fixText("caf\u00E9") == "caf\u00E9")
  }

  test("controls stripped; newline and tab survive as structure") {
    assert(Normalize.fixText("x\u0007y\r\nz") == "xy\nz") // BEL gone, CRLF -> LF
    assert(Normalize.fixText("a\u0000b\u001Bc\u007Fd\u0085e") == "abcde")
    assert(Normalize.fixText("keep\nlines") == "keep\nlines")
    assert(Normalize.fixText("tab\there") == "tab here")  // tab is h-space
  }

  test("zero-width and BOM removed; unicode spaces fold to ASCII space") {
    assert(Normalize.fixText("\uFEFFa\u200Bb") == "ab")
    assert(Normalize.fixText("a\u00A0b\u2003c\u3000d") == "a b c d")
  }

  test("horizontal runs collapse to one space, across stripped chars too") {
    assert(Normalize.fixText("a \t  b") == "a b")
    assert(Normalize.fixText("a \u0007 b") == "a b")   // space BEL space
    assert(Normalize.fixText("a \u200B b") == "a b")   // space ZWSP space
    assert(Normalize.fixText("trail  \n  lead") == "trail \n lead")
    assert(Normalize.fixText("end  ") == "end ")
  }

  test("normalizeDocs: one row per doc, changed flag, null passthrough") {
    val docs = Seq((0L, Some("cafe\u0301")), (1L, Some("plain")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val got = Normalize.normalizeDocs(docs.repartition(3), "doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, Some("caf\u00E9"), true),
      (1L, Some("plain"), false), (2L, None, false)))
  }

  test("no exchange in the plan: kernel pass preserves partitioning") {
    val docs = (0L until 64L).map(i => (i, s"d $i")).toDF("doc_id", "text")
      .repartition(8)
    val out = Normalize.normalizeDocs(docs, "doc_id", "text")
    assert(out.rdd.getNumPartitions == 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"normalization must not shuffle:\n$plan")
  }

  test("non-integral id column is rejected") {
    intercept[IllegalArgumentException] {
      Normalize.normalizeDocs(Seq(("a", "t")).toDF("id", "text"), "id", "text")
    }
  }
}

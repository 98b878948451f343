package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class C4FilterSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("c4filter-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def report(text: String, bad: Seq[String] = Nil) = {
    val df = Seq((0L, text)).toDF("doc_id", "text")
    val r = C4Filter.clean(df, "doc_id", "text", bad).collect()(0)
    (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4), r.getBoolean(5))
  }

  test("line rules: terminal punctuation, min words, javascript") {
    val good = "one two three four five six."
    // no terminal punct
    assert(report(s"$good\n$good\n$good\nno punct many words in this line")
      == (4, 3, 3 * good.length + 2, "ok", true))
    // too few words, each terminal-punct variant accepted
    assert(report(s"tiny one.\n$good\nall good words here yes!\nquote line with five words\"\nq w e r t y?")._2 == 4)
    // javascript mention drops the line regardless of shape
    val js = "please enable JavaScript to view this content."
    assert(report(s"$good\n$js\n$good\n$good") == (4, 3, 3 * good.length + 2, "ok", true))
  }

  test("doc rules: lorem ipsum, brace, bad word, min kept lines — first match wins") {
    val good = "one two three four five six."
    val three = s"$good\n$good\n$good"
    assert(report(s"$three\nLorem Ipsum dolor sit amet today.")._4 == "lorem_ipsum")
    assert(report(s"$three\nfunction f() { return 0; }")._4 == "brace")
    assert(report(s"$three\nthis has xxbadxx inside it now.", Seq("xxbadxx"))._4 == "bad_word")
    // bad word is case-insensitive and only consulted when configured
    assert(report(s"$three\nthis has XXBADXX inside it now.", Seq("xxbadxx"))._4 == "bad_word")
    assert(report(s"$three\nthis has xxbadxx inside it now.")._4 == "ok")
    assert(report(s"$good\n$good")._4 == "too_few_lines")
    // lorem ipsum beats brace beats bad word beats line count
    assert(report("lorem ipsum { xxbadxx", Seq("xxbadxx"))._4 == "lorem_ipsum")
    assert(report("{ xxbadxx", Seq("xxbadxx"))._4 == "brace")
    assert(report("xxbadxx", Seq("xxbadxx"))._4 == "bad_word")
  }

  test("totality: empty and whitespace-only docs report zero lines, drop cleanly") {
    assert(report("") == (0, 0, 0, "too_few_lines", false))
    assert(report("   \n\n  \n") == (0, 0, 0, "too_few_lines", false))
  }

  test("clean_len is the rejoined surviving text, not the raw text") {
    val a = "alpha beta gamma delta epsilon zeta."
    val b = "one two three four five six!"
    val (_, keptN, len, _, _) = report(s"junk line\n$a\nmid junk\n$b")
    assert(keptN == 2)
    assert(len == a.length + 1 + b.length)
  }

  test("single shuffle-free projection: no Exchange in the plan") {
    val df = Seq((0L, "x.\ny.")).toDF("doc_id", "text")
    val plan = C4Filter.clean(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}

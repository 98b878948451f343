package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("lmscore-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("bitLen is floor(log2)+1") {
    assert(LmScore.bitLen(1) == 1)
    assert(LmScore.bitLen(2) == 2)
    assert(LmScore.bitLen(3) == 2)
    assert(LmScore.bitLen(4) == 3)
    assert(LmScore.bitLen(255) == 8)
    assert(LmScore.bitLen(256) == 9)
    assert(LmScore.bitLen(Long.MaxValue) == 63)
    intercept[IllegalArgumentException](LmScore.bitLen(0))
  }

  test("train: exact counts, vocab size, null texts ignored") {
    val train = Seq("a b a", "b a", null).toDF("text")
    val m = LmScore.train(train, "text", maxUnigrams = 10, maxBigrams = 10)
    assert(m.vocab == 2)
    assert(m.uni == Map("a" -> 3L, "b" -> 2L))
    assert(m.bi == Map(
      LmScore.bigramKey("a", "b") -> 1L,
      LmScore.bigramKey("b", "a") -> 2L))
  }

  test("pruning keeps top-K by (count desc, key asc) — deterministic") {
    // unigram counts: x:2, a:1, b:1, c:1 -> cap 3 keeps x, then a, b (key asc)
    val train = Seq("x a", "x b", "c").toDF("text")
    val m = LmScore.train(train, "text", maxUnigrams = 3, maxBigrams = 1)
    assert(m.uni.keySet == Set("x", "a", "b"))
    assert(m.vocab == 4) // vocab counts ALL distinct tokens, pre-pruning
    // bigrams x-a and x-b both count 1; cap 1 keeps the key-ascending first
    assert(m.bi.keySet == Set(LmScore.bigramKey("x", "a")))
  }

  test("train is invariant to input partitioning") {
    val texts = (0 until 200).map(i => s"w${i % 7} w${i % 3} w${i % 5} w${i % 7}")
    val m1 = LmScore.train(texts.toDF("text").repartition(1), "text", 5, 9)
    val m7 = LmScore.train(texts.toDF("text").repartition(7), "text", 5, 9)
    assert(m1 == m7)
  }

  test("score: hand-computed surprise bits, unseen/pruned fall back to 0 counts") {
    val train = Seq("a b a b a").toDF("text") // a:3 b:2, ab:2 ba:2, V=2
    val m = LmScore.train(train, "text", 10, 10)
    // doc "a b z": bigrams (a,b): BL(3+2)-BL(2+1)=3-2=1 ; (b,z): BL(2+2)-BL(0+1)=3-1=2
    // doc "z"    : 0 bigrams, bits 0, keep
    val docs = Seq((0L, "a b z"), (1L, "z")).toDF("doc_id", "text")
    val got = LmScore.score(docs, "doc_id", "text", m, maxBitsPerBigramMilli = 1500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 3L, 1500L, true),  // 3000 <= 1500*2 boundary: kept
      (1L, 0L, 0L, 0L, true)))
  }

  test("keep gate is a strict integer cross-multiply (boundary below threshold fails)") {
    val train = Seq("a b a b a").toDF("text")
    val m = LmScore.train(train, "text", 10, 10)
    val docs = Seq((0L, "a b z")).toDF("doc_id", "text") // 3 bits / 2 bigrams
    val got = LmScore.score(docs, "doc_id", "text", m, maxBitsPerBigramMilli = 1499L)
      .collect().map(_.getBoolean(4))
    assert(got.toSeq == Seq(false))
  }

  test("scoring plan has no shuffle before the output sort (broadcast model, kernel pass)") {
    val train = Seq("a b").toDF("text")
    val m = LmScore.train(train, "text", 4, 4)
    val docs = Seq((0L, "a b")).toDF("doc_id", "text")
    val plan = LmScore.score(docs, "doc_id", "text", m, 5000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"scoring must not hash-shuffle:\n$plan")
  }

  test("review pins: U+0001-bearing tokens are excluded from the LM stream " +
      "(no bigram-key collision); a null id fails loudly") {
    // "x\u0001y" would collide with bigramKey("x","y") under raw whitespace
    // tokenization — it must vanish from counts and key space entirely
    val tr = Seq("a b", "x\u0001y a b").toDF("text")
    val m = LmScore.train(tr, "text", maxUnigrams = 10, maxBigrams = 10)
    assert(m.vocab == 2, "vocab is {a, b} only")
    assert(m.uni == Map("a" -> 2L, "b" -> 2L))
    assert(m.bi == Map(LmScore.bigramKey("a", "b") -> 2L))
    assert(!m.uni.keys.exists(_.exists(_ == 1.toChar)))
    // scoring skips the excluded token too: "a x\u0001y b" scores as "a b"
    val docs = Seq((1L, "a x\u0001y b")).toDF("doc_id", "text")
    val row = LmScore.score(docs, "doc_id", "text", m, 5000L).collect()(0)
    assert(row.getLong(1) == 1L, "one bigram: (a, b)")
    // null id: loud failure, not a silent drop
    val bad = Seq((null.asInstanceOf[java.lang.Long], "a b"))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      LmScore.score(bad, "doc_id", "text", m, 5000L).collect()
    }
    assert(ex.toString.contains("id") || Option(ex.getCause).exists(
      _.getMessage.contains("id")))
  }
}

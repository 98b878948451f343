package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("applyMerge: greedy left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("b", "a", "a", "a"), "a", "a") == Seq("b", "aa", "a"))
    assert(Bpe.applyMerge(Seq("x"), "a", "a") == Seq("x"))
    assert(Bpe.applyMerge(Seq("h", "u", "g"), "u", "g") == Seq("h", "ug"))
  }

  test("learns the classic hug/pug corpus in reference order") {
    // Sennrich walk-through shape: counts hug=10, pug=5, pun=12, bun=4,
    // hugs=5. Pair counts round 1: (u,g)=10+5+5=20, (u,n)=12+4=16,
    // (h,u)=15, (p,u)=17, ... -> (u,g) first; then (u,n)=16, (h,ug)=15,
    // (p,u)... recompute: after ug: (p,u) only in pun/pug? pug='p u g' ->
    // 'p ug' so (p,ug)=5, (p,u)=12 (pun), (h,ug)=15, (u,n)=16.
    val docs = (
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
      ).mkString(" ")
    val out = Bpe.learnMerges(Seq(docs).toDF("text"), "text", merges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "u", "g", 20L)))
    assert(out(1) == ((2, "u", "n", 16L)))
    assert(out(2) == ((3, "h", "ug", 15L)))
    assert(out(3) == ((4, "p", "un", 12L)))
  }

  test("ties break lexicographically on (left, right); dry corpus stops early") {
    // "ab" and "cd" both appear twice -> (a,b) ties (c,d): (a,b) first
    val out = Bpe.learnMerges(Seq("ab ab cd cd").toDF("text"), "text", merges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) == ((1, "a", "b", 2L)))
    assert(out(1) == ((2, "c", "d", 2L)))
    // after both merges every word is a single symbol: no pairs left,
    // the loop stops at 2 merges instead of 10
    assert(out.length == 2)
  }

  test("word counts aggregate across documents and partitions") {
    val docs = (1 to 40).map(i => s"re re do").toDF("text").repartition(7)
    val out = Bpe.learnMerges(docs, "text", merges = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    // 'r e' appears in 80 word instances (word 're' count 80)
    assert(out(0) == (("r", "e", 80L)))
  }

  test("encodeWord: lowest-rank pair first, re-scan after each merge") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("x", "y") -> 2)
    assert(Bpe.encodeWord("abc", ranks).toSeq == Seq("abc"))
    assert(Bpe.encodeWord("abxy", ranks).toSeq == Seq("ab", "xy"))
    assert(Bpe.encodeWord("cab", ranks).toSeq == Seq("c", "ab"))
    assert(Bpe.encodeWord("zq", ranks).toSeq == Seq("z", "q"))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq())
    // a later-rank merge creating an EARLIER-rank pair must still fire:
    // ranks (ab,c)=0, (a,b)=1 on "abc": only (a,b) is present first ->
    // merge to [ab, c], which NOW contains rank-0 (ab, c) -> [abc].
    // A single in-order sweep would stop at [ab, c].
    val r2 = Map(("ab", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", r2).toSeq == Seq("abc"))
  }

  test("encode: train then apply round-trips the training corpus") {
    val corpus = (
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
      ).mkString(" ")
    val merges = Bpe.learnMerges(Seq(corpus).toDF("text"), "text", merges = 4)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Seq((1L, "hug pun hugs"), (2L, "bun pug zap"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // learned: ug, un, h+ug=hug, p+un=pun
    assert(out(1L) == Seq("hug", "pun", "hug", "s"))
    assert(out(2L) == Seq("b", "un", "p", "ug", "z", "a", "p"))
    assert(out(3L) == Seq())
  }
}

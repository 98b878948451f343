package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for [[Dsir]]: the distributed featurize/learn/score path
  * vs a sequential reference, the production xxHash bucket + log-ratio
  * default behavior, and the degenerate-doc edges. */
class DsirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("dsir-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import DsirSpec.{B, bucketFn}

  private def refCounts(texts: Seq[String]): Array[Long] = {
    val acc = new Array[Long](B)
    texts.foreach { t =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      for (i <- 0 until ws.length - 1) acc(bucketFn(ws(i), ws(i + 1))) += 1
    }
    acc
  }

  private val targetTexts = Seq(
    "spark catalyst plans the join order well",
    "catalyst plans broadcast joins for small tables",
    "spark catalyst prunes columns at the scan")
  private val rawTexts = targetTexts ++ Seq(
    "the cat sat on the mat all day",
    "der hund lief durch den park heute",
    "one two three four five six seven eight",
    "x", "")

  test("bigramBucketCounts matches the sequential reference on any partitioning") {
    val df = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(3)
    val got = Dsir.bigramBucketCounts(df, "text", B, bucketFn)
    assert(got.toSeq == refCounts(rawTexts).toSeq)
    val got7 = Dsir.bigramBucketCounts(df.repartition(7), "text", B, bucketFn)
    assert(got7.toSeq == got.toSeq)
  }

  test("select scores match the sequential recompute; empty/1-word docs score 0") {
    val ct = refCounts(targetTexts)
    val cr = refCounts(rawTexts)
    val w = Array.tabulate(B)(b => (3L * ct(b) - cr(b)).toDouble)
    val df = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(5)
    val out = Dsir.select(df, "text", "id", w, bucketFn, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1)
    rawTexts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      var s = 0.0
      for (k <- 0 until ws.length - 1) s += w(bucketFn(ws(k), ws(k + 1)))
      assert(out(i)._2 == s, s"doc $i score")
      assert(out(i)._3 == (s >= 1.0), s"doc $i keep")
    }
    assert(out(6)._2 == 0.0 && out(7)._2 == 0.0) // "x" and "" have no bigram
  }

  test("learnWeightsSubset (one scan) equals learnWeights (two scans) on a subset target") {
    import org.apache.spark.sql.functions.col
    val df = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(3)
    val target = df.filter(col("id") < 3)
    val two = Dsir.learnWeights(target, df, "text", B, bucketFn,
      (ct, cr) => Array.tabulate(B)(b => (3L * ct(b) - cr(b)).toDouble))
    val (one, nt) = Dsir.learnWeightsSubset(df, "text", col("id") < 3, B, bucketFn,
      (ct, cr) => Array.tabulate(B)(b => (3L * ct(b) - cr(b)).toDouble))
    assert(one.toSeq == two.toSeq)
    assert(nt == 3L)
  }

  test("production path: xxBucket + logRatioWeights ranks target-like docs higher") {
    val bf = Dsir.xxBucket(Dsir.DefaultBuckets)
    val target = targetTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val raw = rawTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val w = Dsir.learnWeights(target, raw, "text", Dsir.DefaultBuckets, bf)
    val scores = Dsir.select(raw, "text", "id", w, bf, threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val inDist = (0 to 2).map(scores(_)).min
    val offDist = (3 to 5).map(i => scores(i.toLong)).max
    assert(inDist > offDist,
      s"target-like docs must outscore off-distribution docs ($inDist vs $offDist)")
    // xxBucket stays in range and is deterministic
    val b1 = bf("alpha", "beta")
    assert(b1 == bf("alpha", "beta") && b1 >= 0 && b1 < Dsir.DefaultBuckets)
  }
}

/** Companion holds the injected bucket fn so Spark closures don't capture
  * the (non-serializable) suite instance. */
object DsirSpec {
  private val B = 32
  private val bucketFn: (String, String) => Int =
    (a, b) => (a.length * 31 + b.length * 17 + a.charAt(0).toInt) % B
}

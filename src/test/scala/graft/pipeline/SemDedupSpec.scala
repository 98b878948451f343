package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth checks for [[SemDedup]]: the distributed Lloyd rounds and
  * the within-cluster pruning are compared against a sequential reference
  * implementation (same argmax convention, same mean), including a corpus
  * where assignments MOVE between rounds — the multi-iteration dynamics the
  * q46 one-round oracle does not exercise. */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("semdedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---- sequential reference (same conventions as the kernel) ----
  private def refNearest(cents: Array[Array[Double]], v: Array[Double]): Int = {
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    var best = Double.NegativeInfinity; var bk = 0
    for (k <- cents.indices) {
      var dot = 0.0
      for (i <- 0 until math.min(v.length, cents(k).length)) dot += v(i) * cents(k)(i)
      val s = if (norms(k) > 0) dot / norms(k) else 0.0
      if (s > best) { best = s; bk = k }
    }
    bk
  }

  private def refKmeans(vs: Seq[Array[Double]], init: Array[Array[Double]],
      iters: Int): Array[Array[Double]] = {
    var cents = init.map(_.clone())
    for (_ <- 0 until iters) {
      val dim = init.head.length
      val sums = Array.fill(init.length)(new Array[Double](dim))
      val counts = new Array[Long](init.length)
      vs.foreach { v =>
        val c = refNearest(cents, v)
        for (i <- 0 until math.min(v.length, dim)) sums(c)(i) += v(i)
        counts(c) += 1
      }
      cents = Array.tabulate(init.length) { c =>
        if (counts(c) == 0) cents(c).clone()
        else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  private def refCos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until math.min(a.length, b.length)) dot += a(i) * b(i)
    a.foreach(x => na += x * x); b.foreach(x => nb += x * x)
    if (na > 0 && nb > 0) dot / (math.sqrt(na) * math.sqrt(nb)) else 0.0
  }

  // integer components -> exact distributed sums -> partitioning-independent
  private def vec(id: Long): Array[Double] = {
    val tc = (id % 3).toInt
    val v = new Array[Double](6)
    v(2 * tc) = 50.0 + (id % 5)       // cluster axis, slight spread
    v(2 * tc + 1) = (id % 7).toDouble // jitter axis
    v(5) = (id % 2).toDouble          // shared dim (for cluster 2 this
    v                                 //  overwrites its jitter — harmless,
  }                                   //  the reference sees the same vectors

  test("kmeans centroids match the sequential reference, multi-iteration, " +
      "assignments move between rounds") {
    // 2-D angular corpus engineered so round 2 RECLAIMS a direction that
    // round 1 misassigned: bases at 10/24/70/80 degrees, seeds at 0 and 40.
    // Round 1 splits {10} vs {24,70,80} (boundary 20 deg); the round-1
    // centroids sit at ~10 and ~58.5 deg, moving the boundary to ~34 deg,
    // so the 24-deg direction migrates to cluster 0 in round 2 (10-deg
    // margin everywhere — float-robust). Integer components x integer
    // scales keep every distributed sum exact.
    val bases = Array(Array(983.0, 173.0), Array(913.0, 407.0),
      Array(342.0, 940.0), Array(174.0, 985.0))
    val n = 240L
    val vs = (0L until n).map { id =>
      val s = 1.0 + (id % 3)
      bases((id % 4).toInt).map(_ * s)
    }
    val init = Array(Array(1000.0, 0.0), Array(766.0, 643.0))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb").repartition(5)
    for (iters <- 1 to 3) {
      val got = SemDedup.kmeansCentroids(df, "emb", init, iters)
      val want = refKmeans(vs, init, iters)
      for (k <- init.indices; i <- 0 until 2)
        assert(got(k)(i) == want(k)(i),
          s"iters=$iters centroid $k dim $i: ${got(k)(i)} != ${want(k)(i)}")
    }
    // sanity: the reference itself moved between iteration counts (the
    // 24-deg base belongs to cluster 1 after round 1, cluster 0 after 2)
    assert(refKmeans(vs, init, 1).flatMap(_.toSeq).toSeq !=
      refKmeans(vs, init, 3).flatMap(_.toSeq).toSeq)
    assert(refNearest(init, bases(1)) == 1)                      // round 1
    assert(refNearest(refKmeans(vs, init, 1), bases(1)) == 0)    // round 2
  }

  test("semDedup clusters + keep flags match brute force; keeper is lowest id") {
    val n = 120L
    val rows = (0L until n).map(i => (i, vec(i)))
    val df = rows.toDF("id", "emb").repartition(7)
    val init = Array(
      Array(1.0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 1.0, 0, 0, 0),
      Array(0.0, 0, 0, 0, 1.0, 0))
    val tau = 0.999
    val out = SemDedup.semDedup(df, "emb", "id", init, iters = 2, tau = tau)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)

    val cents = refKmeans(rows.map(_._2), init, 2)
    val refAssign = rows.map { case (id, v) => (id, refNearest(cents, v), v) }
    val refDropped = (for {
      (ia, ca, va) <- refAssign; (ib, cb, vb) <- refAssign
      if ca == cb && ia < ib && refCos(va, vb) >= tau
    } yield ib).toSet

    assert(out.length == n)
    out.foreach { case (id, cl, typ, keep) =>
      val (_, rc, rv) = refAssign(id.toInt)
      assert(cl == rc, s"id=$id cluster $cl != $rc")
      assert(math.abs(typ - refCos(rv, cents(rc))) < 1e-12, s"id=$id typicality")
      assert(keep == !refDropped(id), s"id=$id keep")
    }
    // the planted corpus must actually exercise both branches
    assert(out.exists(_._4) && out.exists(o => !o._4))
    // one keeper per near-dup group, and it is the group minimum
    assert(refDropped.nonEmpty)
  }

  test("determinism: identical output across partitionings (exact components)") {
    val rows = (0L until 90L).map(i => (i, vec(i)))
    val init = Array(Array(1.0, 0, 0, 0, 0, 0), Array(0.0, 0, 1.0, 0, 0, 0),
      Array(0.0, 0, 0, 0, 1.0, 0))
    def run(parts: Int) =
      SemDedup.semDedup(rows.toDF("id", "emb").repartition(parts),
          "emb", "id", init, iters = 2, tau = 0.999)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    assert(run(2) == run(13))
  }

  test("reliable checkpoint mode (checkpoint dir set) produces identical results") {
    val rows = (0L until 90L).map(i => (i, vec(i)))
    val init = Array(Array(1.0, 0, 0, 0, 0, 0), Array(0.0, 0, 1.0, 0, 0, 0),
      Array(0.0, 0, 0, 0, 1.0, 0))
    def run() = SemDedup.semDedup(rows.toDF("id", "emb"), "emb", "id",
        init, iters = 2, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("semdedup-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      assert(run() == local)
      val wrote = scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(dir))) { st =>
        st.filter(p => java.nio.file.Files.isRegularFile(p)).count()
      }
      assert(wrote > 0, "reliable mode must persist checkpoint files")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("empty cluster keeps its previous centroid") {
    val rows = Seq((1L, Array(10.0, 0.0)), (2L, Array(12.0, 1.0)))
    val init = Array(Array(1.0, 0.0), Array(0.0, 1.0)) // nothing lands in #1
    val got = SemDedup.kmeansCentroids(rows.toDF("id", "emb"), "emb", init, 2)
    assert(got(1).toSeq == Seq(0.0, 1.0))
    assert(got(0)(0) == 11.0 && got(0)(1) == 0.5)
  }
}

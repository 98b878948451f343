package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
 * k-means-cluster the embedding space, then prune near-duplicates by
 * pairwise cosine WITHIN each cluster only — the clustering is what makes
 * pairwise comparison feasible at web scale (the paper's design point:
 * k sized so mean cluster occupancy is ~10^2-10^3, so per-cluster pairwise
 * work is bounded and total candidate volume is O(n·occupancy), never
 * O(n^2)).
 *
 * Spark shape, built for the 100 TB regime:
 *  - Lloyd iterations never shuffle the data: each iteration is ONE scan
 *    with a broadcast k×dim centroid matrix; per-partition partial sums
 *    (k×dim doubles + k counts per partition) are the only thing that
 *    leaves the executors (the classic treeAggregate k-means layout).
 *  - The pairwise stage shuffles (id, vec) ONCE by cluster id and
 *    compares only `a.id < b.id` cluster-mates; a skewed (hot) cluster is
 *    the one scale hazard — AQE skew-join splitting applies to the
 *    self-join, and the paper's remedy (raise k) keeps occupancy bounded
 *    by construction.
 *  - Centroid seeding is caller-supplied (deterministic), iteration count
 *    fixed — no RNG, so results are reproducible across partitionings up
 *    to floating-point mean aggregation order (exact when embedding
 *    components are exactly representable, as in the oracle corpus).
 *
 * Reference scope note: the reference (AnyCrawl) has no embedding ops;
 * this extends the engine's training-data curation layer alongside
 * [[Dedup]]/[[Curate]] (SURVEY.md §2.11).
 */
object SemDedup {

  /** Argmax_k cos(v, c_k), ties to the LOWEST cluster index. Ranks by
    * dot(v,c_k)/|c_k| — |v| is a positive per-row constant across k, so
    * dropping it cannot change the argmax (zero-norm rows score 0.0
    * everywhere and land in cluster 0, same as the full-cosine rule). */
  private def nearest(cents: Array[Array[Double]], norms: Array[Double],
      v: Array[Double]): Int = {
    var best = Double.NegativeInfinity
    var bestK = 0
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var dot = 0.0
      var i = 0
      val n = math.min(v.length, c.length)
      while (i < n) { dot += v(i) * c(i); i += 1 }
      val sim = if (norms(k) > 0) dot / norms(k) else 0.0
      if (sim > best) { best = sim; bestK = k }
      k += 1
    }
    bestK
  }

  private def centNorms(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))

  /** Lloyd's k-means with fixed `init` centroids and a fixed iteration
    * count. Returns the final centroids. Each iteration: one scan, one
    * bounded collect of per-partition (sum, count) partials — k×dim×P
    * doubles reach the driver, independent of row count. An empty cluster
    * keeps its previous centroid (documented; the oracle corpus never
    * produces one). */
  def kmeansCentroids(df: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    require(init.nonEmpty && iters >= 0, "need k >= 1 centroids, iters >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val k = init.length
    val dim = init.head.length
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Array[Double]]
    var cents = init.map(_.clone())
    var it = 0
    while (it < iters) {
      val cb = spark.sparkContext.broadcast((cents, centNorms(cents)))
      // flat (k*dim sums ++ k counts) per partition: a plain array<double>
      // row, bounded by k×dim regardless of partition size
      val partials: Array[Array[Double]] = vecs.mapPartitions { rows =>
        val (cs, ns) = cb.value
        val acc = new Array[Double](k * dim + k)
        rows.foreach { v =>
          val c = nearest(cs, ns, v)
          var i = 0
          val n = math.min(v.length, dim)
          while (i < n) { acc(c * dim + i) += v(i); i += 1 }
          acc(k * dim + c) += 1.0
        }
        Iterator.single(acc)
      }.collect()
      cb.destroy()
      val next = Array.tabulate(k) { c =>
        var cnt = 0.0
        partials.foreach(p => cnt += p(k * dim + c))
        if (cnt == 0.0) cents(c).clone()
        else Array.tabulate(dim) { i =>
          var s = 0.0
          partials.foreach(p => s += p(c * dim + i))
          s / cnt
        }
      }
      cents = next
      it += 1
    }
    cents
  }

  /** (id, vec, norm, cluster) against fixed final centroids — one
    * codegen-free Scala-kernel scan, no join (the q37 IVF-assignment
    * layout). The row norm is computed here ONCE so the quadratic pairwise
    * stage pays only a dot product per pair, not three. */
  private def assign(df: DataFrame, vecCol: String, idCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast((cents, centNorms(cents)))
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (cs, ns) = cb.value
        it.map { case (id, v) =>
          var na = 0.0
          var i = 0
          while (i < v.length) { na += v(i) * v(i); i += 1 }
          (id, v, math.sqrt(na), nearest(cs, ns, v))
        }
      }
      .toDF("id", "v", "norm", "cluster")
  }

  /** Full SemDedup: k-means (fixed seed centroids, `iters` Lloyd rounds),
    * then within each cluster drop every doc having a LOWER-id cluster-mate
    * with cosine >= `tau` (one keeper per semantic group, the repo-wide
    * lowest-id-keeper convention of [[Graph.dupClusters]]). Returns
    * (idCol, cluster, typicality, keep) where `typicality` is the cosine
    * of the doc to its final cluster centroid — the SemDeDup paper's
    * ranking signal for which member to keep. */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
      init: Array[Array[Double]], iters: Int, tau: Double): DataFrame = {
    val cents = kmeansCentroids(df, vecCol, init, iters)
    // Checkpoints.step, not a bare localCheckpoint: with a checkpoint dir
    // configured the assigned frame survives executor loss through the
    // quadratic pairwise join (the Graph-round policy)
    val assigned = Checkpoints.step(assign(df, vecCol, idCol, cents))

    // typicality via the SAME left-to-right fold order as
    // Similarity.cosineCol / DuckDB's list_cosine_similarity: dot, then
    // each norm, then dot / (sqrt(na) * sqrt(nb)) — bit-equal on equal
    // inputs (the q17/q21/q37-proven contract)
    val centLit = array(cents.map(c => array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val myCent = element_at(centLit, col("cluster") + 1)
    val typicality = Similarity.cosineCol(col("v"), myCent)

    // pairwise stage: one shuffle by cluster, a.id < b.id, Scala-kernel
    // cosine (interpreted higher-order-function Columns measured ~2ms/row
    // in the q37 audit; the pair volume is quadratic in occupancy, so the
    // kernel matters here). Norms ride the rows from the assignment scan,
    // so each pair pays one dot product — same doubles as the recompute:
    // dot / (sqrt(na) * sqrt(nb)) with the sqrts hoisted per row.
    val pairCos = udf { (a: Seq[Double], b: Seq[Double], na: Double, nb: Double) =>
      var dot = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); i += 1 }
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    val x = assigned.select(col("id").as("a_id"), col("v").as("a_v"),
      col("norm").as("a_n"), col("cluster"))
    val y = assigned.select(col("id").as("b_id"), col("v").as("b_v"),
      col("norm").as("b_n"), col("cluster"))
    val dropped = x.join(y, "cluster")
      .filter(col("a_id") < col("b_id"))
      .filter(pairCos(col("a_v"), col("b_v"), col("a_n"), col("b_n")) >= tau)
      .select(col("b_id").as("id"))
      .distinct()

    assigned
      .join(dropped.withColumn("__dropped", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster").cast("int").as("cluster"),
        typicality.as("typicality"),
        (coalesce(col("__dropped"), lit(false)) === false).as("keep"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed graph operators for the training-data pipeline:
 *
 *  - [[connectedComponents]]: turn near-duplicate PAIRS (the output of
 *    MinHash-LSH / SimHash / exact-hash adjacency, Dedup.scala) into
 *    duplicate CLUSTERS. Every production dedup pipeline needs this step —
 *    pairs alone under-remove (a 100-doc near-dup clique yields 99 pairs but
 *    must keep exactly 1 doc), and naive transitive closure materializes
 *    O(cluster²) rows. Implemented as the alternating large-star/small-star
 *    algorithm (Kiveris et al., "Connected Components in MapReduce and
 *    Beyond", SoCC 2014): O(log n) rounds on any graph, each round two
 *    hash-shuffles of the CURRENT edge set — never an all-pairs join, never
 *    a driver-side graph. GraphX/GraphFrames ship the same algorithm; this
 *    is a dependency-free DataFrame formulation (groupBy-min + equi-join
 *    per star step, no collect_set, so a hot node with 10^8 neighbors
 *    never builds an in-memory neighbor list).
 *
 *  - [[pageRankFixedPoint]]: link-graph centrality over the crawled corpus
 *    in FIXED-POINT integer arithmetic. Real crawlers order their frontier
 *    by link centrality (OPIC / PageRank — the original use PageRank was
 *    built for); floating-point PageRank is non-deterministic at cluster
 *    scale (per-partition sum order varies run to run), which breaks the
 *    engine's determinism contract (W2: canonical order) if ranks feed
 *    scheduling. Scaled-long arithmetic makes every iteration exactly
 *    reproducible on any partitioning AND exactly recomputable by the
 *    DuckDB oracle: integer division `r div deg` and `(x*85) div 100`
 *    have one answer regardless of summation order.
 *
 * Both operators iterate driver-side over DataFrames (the loop is control
 * flow only — all data stays distributed) and break lineage each round
 * with `localCheckpoint`; a production deployment pointed at a reliable
 * checkpoint dir would use `checkpoint` for executor-loss tolerance.
 */
object Graph {

  /**
   * Connected components of the undirected graph given by `(srcCol, dstCol)`
   * pairs. Returns `(id: long, component: long)` where `component` is the
   * minimum node id in the component — one row per distinct node appearing
   * in the input (self-loop-only nodes map to themselves).
   *
   * Alternating star rounds, each a pure DataFrame pipeline:
   *  - large-star: for every node a, link each LARGER neighbor b > a to
   *    m(a) = min(Γ(a) ∪ {a}). Computed as groupBy(a).min + join back —
   *    shuffle volume O(E), independent of skew (no neighbor lists).
   *  - small-star: direct each edge big→small, link each smaller neighbor
   *    (and the node itself) to the minimum smaller neighbor.
   * The edge set converges to disjoint stars centered on component minima;
   * convergence is detected by edge-set equality (count + one-sided
   * `except`, both O(E) — cheap relative to the star rounds themselves).
   */
  def connectedComponents(
      edges0: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 50): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val nodes = edges0
      .select(col(srcCol).cast("long").as("id"))
      .union(edges0.select(col(dstCol).cast("long").as("id")))
      .distinct()
      .localCheckpoint(true)

    // canonical simple undirected edges u < v; self-loops carry no
    // connectivity information
    var e = edges0
      .select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()

    var converged = eCount == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      // ---- large-star
      val dir = e.select($"u".as("a"), $"v".as("b"))
        .union(e.select($"v".as("a"), $"u".as("b")))
      val mins = dir.groupBy($"a")
        .agg(min($"b").as("mn"))
        .select($"a", least($"a", $"mn").as("m"))
      val large = dir.join(mins, "a")
        .filter($"b" > $"a")
        .select(least($"b", $"m").as("u"), greatest($"b", $"m").as("v"))
        .filter($"u" =!= $"v")
        .distinct()

      // ---- small-star (over the large-star output, per the alternating
      // schedule): direct big -> small, hook everything to the local min
      val dir2 = large.select($"v".as("a"), $"u".as("b")) // a > b always
      val mins2 = dir2.groupBy($"a").agg(min($"b").as("m"))
      val joined = dir2.join(mins2, "a")
      val small = joined.select($"b".as("x"), $"m")
        .union(joined.select($"a".as("x"), $"m").distinct())
        .filter($"x" =!= $"m")
        .select(least($"x", $"m").as("u"), greatest($"x", $"m").as("v"))
        .distinct()
        .localCheckpoint(true)

      val smallCount = small.count()
      converged = smallCount == eCount && small.except(e).isEmpty
      e = small
      eCount = smallCount
      iter += 1
    }

    // converged edge set = disjoint stars (u = component min, v = member);
    // groupBy-min guards the (impossible at fixpoint, cheap to enforce)
    // multi-parent case, and isolated input nodes label themselves
    val labels = e.groupBy($"v".as("id")).agg(min($"u").as("component"))
    nodes.join(labels, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }

  /**
   * Duplicate-cluster resolution: near-dup `pairs` (from any Dedup candidate
   * generator) over `docs` → one row per doc `(id, cluster, keep)` where
   * `cluster` is the min doc id of the doc's duplicate cluster (its own id
   * if unpaired) and `keep` marks the cluster canonical (exactly one per
   * cluster). `docs.filter(keep)` is the deduplicated corpus.
   */
  def dupClusters(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("component"), col("id")).as("cluster"),
        (coalesce(col("component"), col("id")) === col("id")).as("keep"))
  }

  /**
   * Fixed-point PageRank: `iterations` synchronous power iterations over
   * the directed graph `(srcCol, dstCol)` with damping `dampNum/dampDen`
   * and total mass `scale` (ranks are longs in units of 1/`scale`).
   * Returns `(id: long, rank_fp: long)`, one row per distinct node.
   *
   * Exact integer recurrence (all divisions are integer `div`, mirrored
   * by `//` in the DuckDB oracle):
   *
   *   r0(v)   = scale div n
   *   base    = (scale div n) * (dampDen - dampNum) div dampDen
   *   r_k(v)  = base + (Σ_{u→v} (r_{k-1}(u) div deg(u))) * dampNum div dampDen
   *
   * Properties at scale: each iteration is ONE shuffle pair (join edges
   * with ranks on src — a broadcast when ranks fit, else a hash join
   * co-partitioned with the edge table — then groupBy dst with map-side
   * partial sums). Division remainders and dangling-node mass are dropped,
   * not redistributed: the loss is deterministic and identical on every
   * partitioning/cluster size, which is the property that lets ranks feed
   * the frontier scheduler without breaking W2 determinism. Rounding error
   * is ≤ iterations * (dampDen + 1) rank units per node — with the default
   * scale that is a 1e-10 relative error, far below any scheduling
   * threshold.
   */
  def pageRankFixedPoint(
      edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10,
      scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val e = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select($"src".as("id"))
      .union(e.select($"dst".as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRankFixedPoint: empty graph")

    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val init = scale / n
    val base = scale / n * (dampDen - dampNum) / dampDen

    var r = nodes.select($"id", lit(init).as("r")).localCheckpoint(true)
    var k = 0
    while (k < iterations) {
      val sums = e
        .join(r, e("src") === r("id"))
        .join(deg, "src")
        .select($"dst", expr("r div deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      r = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select($"id",
          expr(s"$base + (coalesce(s, 0) * $dampNum) div $dampDen").as("r"))
        .localCheckpoint(true)
      k += 1
    }
    r.select($"id", $"r".as("rank_fp"))
  }
}

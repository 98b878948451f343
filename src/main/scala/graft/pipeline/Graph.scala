package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
 * flow only — all data stays distributed) and break lineage each round with
 * a lazy checkpoint. By default that is `localCheckpoint` (executor-resident
 * blocks — fastest, but an executor loss mid-run kills the job because the
 * truncated lineage cannot recompute); when the SparkContext has a
 * checkpoint dir configured, [[stepCheckpoint]] uses reliable `checkpoint`
 * instead, so a multi-hour 10^10-edge run survives executor churn. The
 * caller opts in exactly like the engine does: `setCheckpointDir` before
 * calling.
 */
object Graph {

  /** Round-boundary lineage break.
    *
    * Local mode (no checkpoint dir): LAZY `localCheckpoint` — the plan is
    * re-rooted now and materialization rides the caller's next action, so a
    * round costs exactly one job. Fastest, but an executor loss mid-run
    * kills the job (truncated lineage cannot recompute).
    *
    * Reliable mode (checkpoint dir set): persist + EAGER `checkpoint`. Both
    * halves are load-bearing: a lazy reliable checkpoint only *marks* the
    * RDD, and `doCheckpoint` at the eventual action checkpoints just the
    * first marked ancestor (`spark.checkpoint.checkpointAllMarkedAncestors`
    * defaults false) — intermediates would never be written and the final
    * write would recompute the whole chain. The persist makes the
    * checkpoint-write job read the partitions the materializing job just
    * produced instead of recomputing them (Spark's own scaladoc warning on
    * `RDD.checkpoint`); it is dropped as soon as the reliable copy exists.
    * The extra job per round is the price of surviving executor churn on a
    * multi-hour run. Superseded rounds are deleted by [[dropCheckpoint]]
    * (see the loops) so the checkpoint dir holds O(1) edge-set copies, not
    * O(rounds). */
  private def stepCheckpoint(df: DataFrame): DataFrame = Checkpoints.step(df)

  /** See [[Checkpoints.drop]]: release a SUPERSEDED round's checkpoint
    * once every consumer of the frame has run. */
  private def dropCheckpoint(df: DataFrame): Unit = Checkpoints.drop(df)

  /** Edge-count ceiling for the window-min star formulation (and PageRank's
    * window degree count): below it a whole-neighbor-set window partition is
    * a few MB and the 3-exchange round wins; above it the groupBy+join
    * formulation's map-side partial aggregation is mandatory (a hot node's
    * neighbor set must never be buffered by one task). 2^21 edges ≈ 50 MB
    * worst-case single partition. Overridable per call so tests exercise
    * BOTH formulations against the same ground truth. */
  private[pipeline] val starWindowMaxEdges = 1L << 21

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
   * convergence is detected in two tiers to keep the per-round job count at
   * two (materialize + one scalar aggregate): an exact-arithmetic
   * fingerprint (count, sum(u), sum(v), xor of xxhash64(u,v)) computed in
   * the same tiny job as the count gates the expensive check, and only a
   * fingerprint MATCH triggers the authoritative one-sided `except` —
   * so the O(E)-join equality test runs once per converged component
   * structure instead of every round, and a fingerprint collision can at
   * worst add one extra (correct) round, never terminate early wrongly.
   */
  def connectedComponents(
      edges0: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 50,
      windowMaxEdges: Long = starWindowMaxEdges): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    // all checkpoints below are LAZY: the Dataset's plan is truncated to a
    // LogicalRDD immediately (so iteration never grows the Catalyst plan),
    // but materialization rides the next action instead of paying a
    // dedicated job — the round's fingerprint aggregate is that action
    val nodes = edges0
      .select(col(srcCol).cast("long").as("id"))
      .union(edges0.select(col(dstCol).cast("long").as("id")))
      .distinct()
      .transform(stepCheckpoint)

    // canonical simple undirected edges u < v; self-loops carry no
    // connectivity information
    var e = edges0
      .select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .transform(stepCheckpoint)

    // exact set-insensitive fingerprint: equal edge sets ALWAYS produce
    // equal fingerprints, so inequality proves progress without a join;
    // equality is only a trigger for the authoritative `except` below.
    // Sums run in decimal(38,0): ids may legitimately span the full 64-bit
    // hash range (MinHash/SimHash pipelines key by xxhash64), where a long
    // SUM overflows — an ArithmeticException under Spark 4's default ANSI
    // mode. bit_xor cannot overflow.
    def fingerprint(df: DataFrame): (Long, java.math.BigDecimal, java.math.BigDecimal, Long) = {
      val zero = java.math.BigDecimal.ZERO
      val r = df.agg(
        count(lit(1)),
        sum($"u".cast("decimal(38,0)")), sum($"v".cast("decimal(38,0)")),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0),
        if (r.isNullAt(1)) zero else r.getDecimal(1).stripTrailingZeros(),
        if (r.isNullAt(2)) zero else r.getDecimal(2).stripTrailingZeros(),
        r.getLong(3))
    }
    var eFp = fingerprint(e)

    var converged = eFp._1 == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      // Two formulations of the same star steps, picked per round from the
      // edge count the fingerprint already measured (the engine's
      // saltMinBatch pattern): below the threshold a window-min pipeline —
      // 3 exchanges per round, with the per-node neighbor partition an
      // acceptable single task at that size; above it the groupBy-min +
      // equi-join pipeline — ~2x the exchanges but map-side partial
      // aggregation, so a node with 10^8 neighbors never lands in one task.
      val small = starRound(e, useWindow = eFp._1 <= windowMaxEdges)
        .transform(stepCheckpoint)

      val smallFp = fingerprint(small)
      converged = smallFp == eFp && small.except(e).isEmpty
      // the superseded round has no consumers left (its fingerprint and the
      // except above both ran, and it is materialized in either mode):
      // free its blocks / delete its reliable files so the run holds O(1)
      // edge-set copies, not O(rounds)
      dropCheckpoint(e)
      e = small
      eFp = smallFp
      iter += 1
    }
    // labeling a non-fixpoint edge set would return plausible-looking but
    // WRONG components — fail loudly instead of silently corrupting
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIterations rounds " +
        s"(${eFp._1} edges remain); raise maxIterations")

    // converged edge set = disjoint stars (u = component min, v = member);
    // groupBy-min guards the (impossible at fixpoint, cheap to enforce)
    // multi-parent case, and isolated input nodes label themselves
    val labels = e.groupBy($"v".as("id")).agg(min($"u").as("component"))
    nodes.join(labels, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }

  /** One alternating large-star + small-star round over canonical edges
    * `(u < v)`, in the given formulation. Package-visible so the plan-shape
    * spec can pin the exchange counts (3 window / ≤6 groupBy+join) that the
    * per-round latency argument rests on. */
  private[pipeline] def starRound(e: DataFrame, useWindow: Boolean): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._

    // ---- large-star: link each larger neighbor b > a to
    //      m(a) = min(Γ(a) ∪ {a})
    val dir = e.select($"u".as("a"), $"v".as("b"))
      .union(e.select($"v".as("a"), $"u".as("b")))
    val large = if (useWindow) {
      val wa = Window.partitionBy($"a")
      dir.withColumn("m", least($"a", min($"b").over(wa)))
        .filter($"b" > $"a")
        .select(least($"b", $"m").as("u"), greatest($"b", $"m").as("v"))
        .filter($"u" =!= $"v")
    } else {
      val mins = dir.groupBy($"a")
        .agg(min($"b").as("mn"))
        .select($"a", least($"a", $"mn").as("m"))
      // no intermediate distinct: duplicates stay bounded by |dir| = 2E
      // and the small-star's closing distinct dedups — one less exchange
      dir.join(mins, "a")
        .filter($"b" > $"a")
        .select(least($"b", $"m").as("u"), greatest($"b", $"m").as("v"))
        .filter($"u" =!= $"v")
    }

    // ---- small-star (over the large-star output, per the alternating
    // schedule): direct big -> small, hook everything to the local min
    val dir2 = large.select($"v".as("a"), $"u".as("b")) // a > b always
    val hooked = if (useWindow) {
      // min and row_number share one partitioning (single exchange), and the
      // rn = 1 row ALSO emits the (a, m) self-hook via explode — a union of
      // two projections would duplicate the whole upstream subtree in the
      // physical plan (each branch recomputing both window exchanges)
      val wa = Window.partitionBy($"a")
      val wo = wa.orderBy($"b")
      dir2
        .withColumn("m", min($"b").over(wa))
        .withColumn("rn", row_number().over(wo))
        .select(explode(when($"rn" === 1, array($"b", $"a"))
          .otherwise(array($"b"))).as("x"), $"m")
    } else {
      // mins2 IS the distinct (a, m) set — unioning it directly avoids
      // re-deriving it from the join output (which would both duplicate the
      // join subtree and need its own distinct exchange)
      val mins2 = dir2.groupBy($"a").agg(min($"b").as("m"))
      dir2.join(mins2, "a").select($"b".as("x"), $"m")
        .union(mins2.select($"a".as("x"), $"m"))
    }
    hooked
      .filter($"x" =!= $"m")
      .select(least($"x", $"m").as("u"), greatest($"x", $"m").as("v"))
      .distinct()
  }

  /**
   * Duplicate-cluster resolution: near-dup `pairs` (from any Dedup candidate
   * generator) over `docs` → one row per doc `(id, cluster, keep)` where
   * `cluster` is the min doc id PRESENT IN `docs` of the doc's duplicate
   * cluster (its own id if unpaired) and `keep` marks the cluster canonical
   * (exactly one per cluster). `docs.filter(keep)` is the deduplicated
   * corpus. Pairs may reference ids absent from `docs` (candidates generated
   * before a filter pass): the cluster label is re-anchored to the minimum
   * SURVIVING doc, so every non-empty cluster keeps exactly one doc — a raw
   * component-min label would mark zero keepers in such clusters and
   * `filter(keep)` would silently drop them all.
   */
  def dupClusters(
      docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val labeled = docs.select(col(idCol).cast("long").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("comp0"))
    val anchors = labeled.groupBy(col("comp0")).agg(min(col("id")).as("cluster"))
    labeled.join(anchors, "comp0")
      .select(
        col("id"),
        col("cluster"),
        (col("cluster") === col("id")).as("keep"))
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
      dampNum: Long = 85L, dampDen: Long = 100L,
      windowMaxEdges: Long = starWindowMaxEdges): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val e = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .transform(stepCheckpoint)
    val nodes = e.select($"src".as("id"))
      .union(e.select($"dst".as("id")))
      .distinct()
      .transform(stepCheckpoint)
    val n = nodes.count()
    require(n > 0, "pageRankFixedPoint: empty graph")

    // out-degree folded into the edge table ONCE, so the per-iteration plan
    // is a single equi-join with the rank frame + one partial-aggregated
    // groupBy — not a second join against a degree dimension every
    // iteration. Window count below the size threshold (one exchange);
    // groupBy + join above it (map-side combine, no per-node buffering).
    // `e` was just materialized by the nodes count, so this count is a
    // cached-scan job, not a recompute.
    val eCnt = e.count()
    val ed = (if (eCnt <= windowMaxEdges)
        e.withColumn("deg", count(lit(1)).over(Window.partitionBy($"src")))
      else
        e.join(e.groupBy($"src").agg(count(lit(1)).as("deg")), "src"))
      .transform(stepCheckpoint)
    val init = scale / n
    val base = scale / n * (dampDen - dampNum) / dampDen

    // Local mode: every checkpoint is LAZY — the plan is re-rooted at a
    // LogicalRDD each iteration (constant-size Catalyst plan) but NO
    // per-iteration action runs; the caller's single action computes the
    // whole k-step chain, persisting each step's RDD along the way
    // (iteration k+1 reads k's cached partitions, not its lineage).
    // Reliable mode: each iteration is eagerly checkpointed (stepCheckpoint)
    // and the SUPERSEDED rank frame's files/blocks are dropped — an
    // unpersist would corrupt a merely-*marked* lazy local checkpoint, so
    // rotation only runs in the mode where frames are materialized.
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    var r = nodes.select($"id", lit(init).as("r")).transform(stepCheckpoint)
    var k = 0
    while (k < iterations) {
      val sums = ed
        .join(r, ed("src") === r("id"))
        .select($"dst", expr("r div deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("s"))
      val rNext = nodes.join(sums, nodes("id") === sums("dst"), "left")
        .select($"id",
          expr(s"$base + (coalesce(s, 0) * $dampNum) div $dampDen").as("r"))
        .transform(stepCheckpoint)
      if (reliable) dropCheckpoint(r)
      r = rNext
      k += 1
    }
    r.select($"id", $"r".as("rank_fp"))
  }

  /**
   * HITS hubs & authorities (Kleinberg 1999) as an integer fixed point —
   * the link-graph twin of [[pageRankFixedPoint]]: authorities score what
   * good hubs point AT (content worth keeping), hubs score what points at
   * good authorities (index/portal pages a curation pass usually drops) —
   * a useful per-page prior for corpus filtering that PageRank alone
   * doesn't give (a link-farm hub earns hub mass but no authority).
   *
   * Exact integer recurrence (all divisions integer `div`, mirrored by
   * `//` in the DuckDB oracle; h0 = scale div n for every node, the
   * PageRank-style init that keeps the first round's sums bounded by
   * mass·avgdeg rather than scale·|E|):
   *
   *   araw_k(v) = Σ_{u→v} h_{k-1}(u)
   *   a_k(v)    = araw_k(v) div max(Σ araw_k div scale, 1)
   *   hraw_k(u) = Σ_{u→v} a_k(v)
   *   h_k(u)    = hraw_k(u) div max(Σ hraw_k div scale, 1)
   *
   * The sum-normalization replaces the classic L2 norm: it keeps the
   * total mass ≈ scale while preserving the ranking, and integer sums
   * make every round bit-identical under any partitioning/retry.
   *
   * 64-bit bound: after normalization every score ≤ mass ≈ scale, so a
   * node's raw next-round value is ≤ its degree · scale and the global
   * sum is ≤ maxdeg · scale. That product is CHECKED up front (one cheap
   * degree aggregate): graphs whose maximum in/out degree exceeds
   * 2^61 / scale are rejected loudly with instructions to lower `scale`
   * (at scale = 1e9 the guard admits hub degrees to ~2.3e9) — a silent
   * wrap would invert rankings.
   *
   * Scale shape: each half-round is ONE join+partial-agg shuffle over the
   * edge table (the PageRank shape); the normalizer is a 1-row aggregate
   * frame crossJoined back in — part of the lazy plan, never a per-round
   * driver action. Rounds are re-rooted via [[Checkpoints.step]] so the
   * Catalyst plan stays constant-size over any iteration count.
   */
  def hitsFixedPoint(
      edges0: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val e = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .transform(stepCheckpoint)
    val nodes = e.select($"src".as("id"))
      .union(e.select($"dst".as("id")))
      .distinct()
      .transform(stepCheckpoint)
    val n = nodes.count()
    require(n > 0, "hitsFixedPoint: empty graph")
    require(iterations >= 1, s"hitsFixedPoint: iterations must be >= 1, got $iterations")
    // overflow guard (see scaladoc): raw sums are bounded by maxdeg * scale
    val maxDeg = e.select($"src".as("id")).union(e.select($"dst".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("d"))
      .agg(max($"d")).head().getLong(0)
    require(maxDeg <= (Long.MaxValue >> 2) / scale,
      s"hitsFixedPoint: max degree $maxDeg * scale $scale risks 64-bit overflow — " +
        "lower `scale` (e.g. 1e9) for extreme-skew graphs")

    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def normalize(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(sum($"raw").as("tot"))
      raw.crossJoin(tot)
        .select($"id", expr(s"raw div greatest(tot div $scale, 1)").as(outCol))
        .transform(stepCheckpoint)
    }
    def halfRound(score: DataFrame, scoreCol: String,
        from: String, to: String, outCol: String): DataFrame = {
      val raw = e.join(score, e(from) === score("id"))
        .select(col(to).as("nid"), col(scoreCol))
        .groupBy($"nid").agg(sum(col(scoreCol)).as("s"))
      normalize(
        nodes.join(raw, nodes("id") === raw("nid"), "left")
          .select($"id", coalesce($"s", lit(0L)).as("raw")),
        outCol)
    }

    var h = nodes.select($"id", lit(scale / n).as("h")).transform(stepCheckpoint)
    var a: DataFrame = null
    var k = 0
    while (k < iterations) {
      val aNext = halfRound(h, "h", "src", "dst", "a")
      if (reliable && a != null) dropCheckpoint(a)
      a = aNext
      val hNext = halfRound(a, "a", "dst", "src", "h")
      if (reliable) dropCheckpoint(h)
      h = hNext
      k += 1
    }
    a.join(h, "id").select($"id", $"a".as("auth_fp"), $"h".as("hub_fp"))
  }
}

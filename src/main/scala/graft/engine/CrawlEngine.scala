package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Extractor, Robots, UrlOps}
import graft.frontier.SeenBloom

/**
 * The Spark-native crawl engine: AnyCrawl's worker/queue/Redis orchestration
 * (Worker.ts, managers/Queue.ts, managers/Progress.ts) re-expressed as BSP
 * supersteps over a frontier TABLE (SURVEY §3.2). One superstep:
 *
 *   schedule:  politeness top-k per host (two-phase, skew-proof)        C2/W1
 *              + per-job remaining-limit top-k                          P6
 *   fetch:     equi-join of the batch against the pages corpus          J1
 *   extract:   single mapPartitions HTML kernel (all formats, 1 parse)  F5-F8
 *   expand:    posexplode links -> scope/path/depth/robots filters      P2-P5
 *   dedup:     in-batch reduce + bloom pre-filter + exact anti-join     J2/A8
 *   account:   tiny per-job aggregates -> finalize decision             A1-A3
 *   commit:    frontier/results/seen parquet + manifest (atomic)        S5/S7
 *
 * Determinism: canonical order (depth, priority, urlNorm) is a total order
 * over the frontier, so scheduling, seq assignment and the final trace are
 * invariant under partitioning/parallelism (property-tested at local[2] vs
 * local[8] vs a sequential oracle).
 *
 * Scale notes (10^10-URL design): no driver-side collections beyond per-job
 * counters; the seen set is append-only parquet + sharded bloom; all top-k
 * filters are two-phase (salted pre-rank then exact rank over <= 32*k rows
 * per key) so a hot host holding 30% of the frontier never lands in one
 * window partition.
 */
final class CrawlEngine(
    spark: SparkSession,
    pages: DataFrame,
    workDir: String,
    robotsBodies: Map[String, String] = Map.empty,
    settings: CrawlEngine.Settings = CrawlEngine.Settings()) {

  import spark.implicits._
  private val ckpt = new Checkpoint(workDir)

  /** First-occurrence formatted plans per superstep stage, recorded when
    * `Settings.capturePlans` is on (PlanAudit / PLANS.md evidence for the
    * iterative engine — trace()'s own plan is just the committed-parquet
    * read, so the per-stage plans are captured where they are built). */
  val capturedPlans: scala.collection.mutable.LinkedHashMap[String, String] =
    scala.collection.mutable.LinkedHashMap.empty
  private def capturePlan(key: String, df: org.apache.spark.sql.Dataset[_]): Unit =
    if (settings.capturePlans && !capturedPlans.contains(key))
      capturedPlans(key) = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  /**
   * The fetch side of J1, hash-partitioned on the join key ONCE and kept
   * (memory-and-disk). Without this, every superstep re-shuffles and
   * re-sorts the full corpus (measured: the 2 GB shuffle dominated crawl
   * wall-time 4:1 over the extraction kernel). This emulates what a real
   * deployment gets from a bucketed/Iceberg pages table partitioned by
   * url-hash: the fetch join only ever shuffles the (small) frontier batch.
   * Paired with `preferSortMergeJoin=false` so the per-generation join is a
   * shuffled-hash probe (build = frontier batch) instead of a sort of the
   * corpus side.
   */
  private lazy val pagesPrepared: DataFrame = {
    // join strategy pinned per-join via hints — no session-global config
    // flips (a shared SparkSession keeps its settings). Partition count is
    // sized from the corpus row count (the analog of table stats on a
    // bucketed warehouse table): a 100 TB corpus gets thousands of
    // partitions, a test corpus a handful — per-generation probe cost
    // scales with the data instead of paying a fixed 32-task scan.
    val nDefault = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val cnt = pages.count()
    // Count-based sizing ONLY while every possible batch still takes the
    // broadcast fetch path (batch <= corpus <= broadcastBatchMax). Beyond
    // that the shuffled-hash join kicks in, and its exchange reuse demands
    // the corpus partitioning EQUAL spark.sql.shuffle.partitions — any other
    // count re-shuffles the whole corpus every generation (measured: 12 s/
    // generation at 100k pages x 8 cores). shuffle.partitions is the knob
    // that scales both sides together on a real cluster.
    val parts =
      if (cnt <= settings.broadcastBatchMax)
        math.min(nDefault.toLong, math.max(1L, cnt / settings.corpusRowsPerPartition + 1L)).toInt
      else nDefault
    pages.select(col(settings.pagesUrlColumn).as("__purl"), col(settings.pagesHtmlColumn).as("__phtml"))
      .repartition(parts, col("__purl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Materialize the partitioned corpus cache up front (the analog of the
    * bucketed pages table already sitting in the warehouse). Benchmarks call
    * this before starting the throughput clock; correctness paths may ignore
    * it (first superstep pays the load lazily). */
  def prepare(): Unit = { pagesPrepared.count(): Unit }

  // Robots as a broadcast dimension is the north-star design (BASELINE
  // "robots.txt caching as a broadcast dimension"; SURVEY J3/C3). Sizing: a
  // parsed RobotRules is ~100s of bytes, so even 10^7 distinct hosts fit a
  // single-GB broadcast; past that the same filter becomes a broadcast-hash
  // left join of the frontier with a robots(host, rules) table — a config
  // flip of the source, not a redesign.
  private val robotsRules: Map[String, Robots.RobotRules] =
    robotsBodies.map { case (h, b) => (h, Robots.parse(b)) }

  /** Run-constant broadcasts, shipped ONCE per run instead of per superstep.
    * (Measured: ~3-5 tiny TorrentBroadcast writes per generation added
    * 50-100 ms of driver latency each superstep at bench scale.) Rebuilt by
    * run()/resume() AFTER `configs` is assigned — a lazy val here would
    * capture the FIRST run's configs forever and silently schedule a second
    * run()/resume() on the same engine with stale budgets (or throw on a
    * jobId the first run never saw). */
  private var cfgB: org.apache.spark.broadcast.Broadcast[Map[String, CrawlConfig]] = _
  private var robotsB: org.apache.spark.broadcast.Broadcast[Map[String, Robots.RobotRules]] = _
  private var budgetB: org.apache.spark.broadcast.Broadcast[Map[String, Long]] = _
  private var wavesB: org.apache.spark.broadcast.Broadcast[Map[String, Long]] = _
  private var delayIdxB: org.apache.spark.broadcast.Broadcast[Map[String, Map[String, Double]]] = _
  private def refreshBroadcasts(): Unit = {
    // unpersist (not destroy): a cached plan from the previous run may still
    // lazily reference the old broadcast; unpersist frees executor copies
    // while keeping it re-shippable if such a plan is re-evaluated
    Seq(cfgB, robotsB, budgetB, wavesB, delayIdxB).foreach(b =>
      if (b != null) b.unpersist())
    cfgB = spark.sparkContext.broadcast(configs)
    robotsB = spark.sparkContext.broadcast(robotsRules)
    // politeKey -> max Crawl-delay per opted-in job, built ONCE per run
    // (robots + configs are run-constant). The schedule paths probe this
    // instead of re-scanning the whole robots map (with a PSL politeKey
    // computation per entry) from per-row UDFs — the old shape was
    // O(frontierRows x robotsHosts) per superstep under politenessByDomain.
    delayIdxB = spark.sparkContext.broadcast(CrawlEngine.crawlDelayIndex(configs, robotsRules))
    budgetB =
      spark.sparkContext.broadcast(configs.map { case (j, c) => j -> c.hostBudgetPerStep.toLong })
    wavesB =
      spark.sparkContext.broadcast(configs.map { case (j, c) => j -> c.politenessWaves.toLong })
  }

  /** Frontier parquet schema, pinned on every read: saves the per-generation
    * footer-sniffing schema inference (a driver-side file read per source). */
  private val frontierSchema =
    org.apache.spark.sql.Encoders.product[CrawlEngine.FrontierRowF].schema

  final case class Report(
      generations: Int,
      progress: Map[String, JobProgress],
      totalFetched: Long,
      wallMillis: Long)

  // ------------------------------------------------------------------ state
  private var generation: Int = 0
  /** Pending-frontier size after the last superstep (from the write-riding
    * accumulator). Drives the adaptive small-step plan: below
    * `saltMinBatch` pending rows the salted pre-rank phases and the bloom
    * broadcast cost more than the skew/shuffle they prevent, so the
    * superstep takes the single-phase exact path (identical semantics).
    * Unknown (resume) => Long.MaxValue => conservative two-phase. */
  private var lastPendTotal: Long = Long.MaxValue

  private var progress: Map[String, JobProgress] = Map.empty
  private var seqOffsets: Map[String, Long] = Map.empty
  /** Trap-gate state: [[graft.frontier.Traps.familyKey]]s whose enqueued
    * count crossed the owning job's `trapMaxUrls`. Derived from COMMITTED
    * seen sources (the flagged frontier history + compaction buckets), so it
    * needs no checkpoint state of its own and is resume-correct and
    * parallelism/retry-deterministic by construction. Empty unless a job
    * opted in. Test-visible for the gate specs. */
  private[engine] var trapCrossed: Set[String] = Set.empty
  private var bloom: SeenBloom = _
  private var configs: Map[String, CrawlConfig] = Map.empty
  /** Sidecar-bloom cache nonce (see [[Checkpoint.newNonce]]); assigned by
    * run()/resume() before any compaction or probe can happen. */
  private var seenNonce: String = _
  /** Session Hadoop conf for executor-side sidecar probes — a bare
    * `new Configuration()` in tasks would drop `spark.hadoop.*` overlays
    * (fs credentials, defaultFS) on a real cluster. */
  private lazy val hadoopConfB = spark.sparkContext.broadcast(
    new graft.core.SerializableHadoopConf(spark.sessionState.newHadoopConf()))

  /** Start a fresh crawl for `jobs` over the pages corpus. */
  def run(jobs: Seq[CrawlConfig]): Report = {
    val t0 = System.currentTimeMillis()
    configs = jobs.map(c => c.jobId -> c).toMap
    refreshBroadcasts()
    seenNonce = ckpt.newNonce()
    // run() means a FRESH crawl: drop every generation, bucket, bloom file
    // and manifest a previous crawl left under this workDir — otherwise
    // seenSources would fold a dead crawl's frontier tails into this run's
    // dedup, and a crash before this run's first commit could resume() the
    // dead crawl off its stale manifests.
    ckpt.reset()
    progress = jobs.map(c => c.jobId -> JobProgress(c.jobId)).toMap
    seqOffsets = jobs.map(c => c.jobId -> 0L).toMap
    bloom = new SeenBloom(settings.bloomShards, settings.bloomExpectedPerShard, settings.bloomFpp)
    generation = 0

    // ---- generation 0 bootstrap: seeds become the first frontier
    val seedEntries = jobs.flatMap { c =>
      c.seeds.zipWithIndex.flatMap { case (s, i) =>
        val norm = UrlOps.normalize(s)
        val h = UrlOps.host(s)
        val robotsOk = !c.respectRobots ||
          robotsRules.get(h).forall(r => Robots.allowedUrl(r, c.userAgent, s))
        if (robotsOk) Some(FrontierEntry(c.jobId, s, norm, h, 0,
          c.priorityOf.map(f => f(norm)).getOrElse(i.toLong), "", 0)) else None
      }
    }.distinct
    if (settings.seenFilter == "driver")
      seedEntries.foreach(e => bloom.put(e.jobId + "-" + e.urlNorm))
    progress = progress.map { case (j, p) =>
      j -> p.copy(enqueued = seedEntries.count(_.jobId == j).toLong)
    }
    val seedDs = spark.createDataset(seedEntries.map(CrawlEngine.FrontierRowF.of(_, fresh = true)))
    seedDs.write.mode("overwrite").parquet(ckpt.frontierPath(0))
    lastPendTotal = seedEntries.size.toLong

    loop()
    Report(generation, progress, progress.values.map(_.done).sum, System.currentTimeMillis() - t0)
  }

  /** Resume from the last committed generation (kill-at-gen-k test). */
  def resume(jobs: Seq[CrawlConfig]): Report = {
    val t0 = System.currentTimeMillis()
    configs = jobs.map(c => c.jobId -> c).toMap
    refreshBroadcasts()
    // keep the nonce the original run minted — its sidecars are still valid;
    // a missing nonce file (pre-nonce checkpoint) mints one, demoting any
    // old sidecars to maybe-seen (correct, just unfiltered until recompaction)
    seenNonce = ckpt.readNonce().getOrElse(ckpt.newNonce())
    val m = ckpt.lastCommitted.getOrElse(
      throw new IllegalStateException(s"no committed generation under $workDir"))
    progress = m.progress.map(p => p.jobId -> p).toMap
    seqOffsets = m.seqOffsets
    // sidecar mode keeps no driver filter (the whole point) — its durable
    // state is the bucket sidecars themselves, already on disk
    bloom =
      if (settings.seenFilter == "driver") ckpt.loadBloom(m.generation)
      else new SeenBloom(settings.bloomShards, settings.bloomExpectedPerShard, settings.bloomFpp)
    generation = m.generation + 1
    lastPendTotal = Long.MaxValue // unknown -> conservative two-phase plans
    ckpt.truncateAfter(generation) // drop partial output of a crashed gen
    loop()
    Report(generation, progress, progress.values.map(_.done).sum, System.currentTimeMillis() - t0)
  }

  /** Every bucket write of this engine's lifetime: (bucket, rows written).
    * Test-visible evidence that leveled compaction rewrites O(level size)
    * per merge, never O(total seen) per compaction. */
  val compactionLog: scala.collection.mutable.ArrayBuffer[(Checkpoint.SeenBucket, Long)] =
    scala.collection.mutable.ArrayBuffer.empty

  /** Supersteps whose dedup engaged the executor-side sidecar bloom probe —
    * test-visible proof the probe path actually ran (the gating once made it
    * silently unreachable at test batch sizes; see `useBloom`). */
  var sidecarProbeSteps: Int = 0

  /** Write one seen bucket (2-column parquet), build its bloom sidecars in
    * sidecar mode and its trap-count sidecar when any job runs the trap
    * gate, then validity-mark it. Marker last => crash-invisible. */
  private def writeSeenBucket(b: Checkpoint.SeenBucket, src: DataFrame): Unit = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    src.repartition(nPart, $"jobId", $"urlNorm")
      .write.mode("overwrite").parquet(ckpt.seenBucketPath(b))
    val rows = ckpt.committedRowCount(ckpt.seenBucketPath(b), spark.sessionState.newHadoopConf())
    compactionLog += ((b, rows))
    if (settings.seenFilter == "sidecar") {
      graft.frontier.SidecarBlooms.buildForBucket(spark, ckpt.seenBucketPath(b),
        settings.sidecarShards, settings.bloomFpp, rows, seenNonce, hadoopConfB)
    }
    // trap-count sidecar (the q63 gate at bucket scale): pre-aggregated
    // (jobId, host, template, n) rows live INSIDE the bucket dir (the `_`
    // prefix hides them from the bucket's own parquet listing), so they are
    // pruned/merged with their bucket and refreshTrapSet never re-derives
    // templates from a bucketed key again — refresh cost O(templates + tail),
    // not O(seen). Written before the marker: a valid bucket written while
    // the gate is on always carries counts; gate-off buckets fall back to
    // an on-the-fly derive at refresh.
    if (configs.values.exists(_.trapMaxUrls > 0)) {
      import graft.frontier.Traps
      spark.read.parquet(ckpt.seenBucketPath(b))
        .select($"jobId", Traps.hostCol($"urlNorm").as("h"),
          Traps.templateCol($"urlNorm").as("t"))
        .groupBy($"jobId", $"h", $"t").agg(count(lit(1)).as("n"))
        .coalesce(1)
        .write.mode("overwrite").parquet(ckpt.trapCountsPath(b))
    }
    ckpt.markBucket(b)
  }

  /** LEVELED seen compaction (LSM-style; VERDICT r2 #3): once the anti-join
    * read fan-in (buckets + frontier tail dirs) exceeds `compactEvery`, the
    * tail folds into a level-0 bucket — cost O(tail), never O(total seen) —
    * and any level holding >= `levelFanout` buckets merges into one bucket a
    * level up. Per-key compaction cost is amortized O(log generations); the
    * old single-compaction design rewrote the ENTIRE seen set every
    * `compactEvery` generations (a scale-killer at hundreds of generations
    * x 1e9 keys). Runs AFTER gen's commit, so inputs are durable; bucket
    * validity is marker-gated, so a crash mid-compaction is invisible, and a
    * crash between marker and input-prune only leaves redundant coverage
    * (masked by containment in validSeenBuckets; set-union semantics make it
    * harmless regardless). */
  private def maybeCompactSeen(gen: Int): Unit = {
    if (settings.compactEvery <= 0) return
    val maxGen = gen + 1 // frontier/gen=gen+1 was committed by this superstep
    val (buckets, tailPaths) = ckpt.seenSources(maxGen)
    if (buckets.size + tailPaths.size < settings.compactEvery) return
    if (tailPaths.nonEmpty) {
      val from = buckets.map(_.to + 1).maxOption.getOrElse(0)
      writeSeenBucket(Checkpoint.SeenBucket(from, maxGen, 0),
        spark.read.schema(frontierSchema).parquet(tailPaths: _*)
          .where($"__fresh").select($"jobId", $"urlNorm"))
    }
    var merged = true
    while (merged) {
      merged = false
      val cur = ckpt.validSeenBuckets(maxGen)
      cur.groupBy(_.level).toSeq.sortBy(_._1).find(_._2.size >= settings.levelFanout)
        .foreach { case (lvl, bs) =>
          val target = Checkpoint.SeenBucket(bs.map(_.from).min, bs.map(_.to).max, lvl + 1)
          writeSeenBucket(target,
            bs.map(b => spark.read.parquet(ckpt.seenBucketPath(b)).select($"jobId", $"urlNorm"))
              .reduce(_ unionByName _))
          ckpt.pruneSeenBuckets(bs)
          merged = true
        }
    }
  }

  private def activeJobs: Seq[CrawlConfig] =
    configs.values.toSeq.filter(c => !progress(c.jobId).finalized).sortBy(_.jobId)

  /** Rebuild [[trapCrossed]] from the committed seen sources of `gen`, run
    * only when an active job opted into the trap gate and the refresh
    * cadence is due (always on `force`, e.g. at resume, where the committed
    * history may already contain crossed families). Cost shape: bucketed
    * generations contribute their PRE-AGGREGATED count sidecars (O(distinct
    * templates) rows, written at compaction); only the frontier TAIL —
    * bounded by the compaction cadence — is template-derived here, so a
    * refresh is O(templates + tail), never O(total seen). A bucket written
    * while the gate was off lacks the sidecar and is derived on the fly
    * (once — its next merge writes one). */
  private def refreshTrapSet(gen: Int, force: Boolean = false): Unit = {
    val caps = activeJobs.collect {
      case c if c.trapMaxUrls > 0 => c.jobId -> c.trapMaxUrls.toLong
    }.toMap
    if (caps.isEmpty) return
    if (!force && gen % math.max(1, settings.trapRefreshEvery) != 0) return
    import graft.frontier.Traps
    def derive(df: DataFrame): DataFrame = df
      .select($"jobId", Traps.hostCol($"urlNorm").as("h"),
        Traps.templateCol($"urlNorm").as("t"))
      .groupBy($"jobId", $"h", $"t").agg(count(lit(1)).as("n"))
    val (buckets, tails) = ckpt.seenSources(gen)
    val parts =
      buckets.map { b =>
        val counts = ckpt.trapCountsPath(b)
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(counts)))
          spark.read.parquet(counts)
        else derive(spark.read.parquet(ckpt.seenBucketPath(b))
          .select($"jobId", $"urlNorm"))
      } ++
      (if (tails.isEmpty) Nil
       else Seq(derive(spark.read.schema(frontierSchema).parquet(tails: _*)
         .where($"__fresh").select($"jobId", $"urlNorm"))))
    val partials = parts.reduceOption(_ unionByName _).getOrElse(return)
    val minCap = caps.values.min
    trapCrossed = partials
      .filter($"jobId".isin(caps.keys.toSeq: _*))
      .groupBy($"jobId", $"h", $"t").agg(sum($"n").as("n"))
      .filter($"n" >= minCap) // crossed rows only ever reach the driver
      .collect()
      .filter(r => r.getLong(3) >= caps(r.getString(0)))
      .map(r => Traps.familyKey(r.getString(0), r.getString(1), r.getString(2)))
      .toSet
  }

  private def loop(): Unit = {
    var gen = generation
    applyCancellations()
    applyExpiry()
    // resume may land mid-cadence with crossed families already committed —
    // force one refresh off the last committed state before scheduling.
    // Skipped when the loop's own cadence-gated refresh is about to run
    // anyway (its seenSources(gen) strictly covers seenSources(gen - 1)).
    if (gen > 0 && gen % math.max(1, settings.trapRefreshEvery) != 0)
      refreshTrapSet(gen - 1, force = true)
    while (activeJobs.nonEmpty && gen < settings.maxGenerations) {
      // NOTE: each generation re-roots from parquet deliberately — carrying
      // a persisted Dataset across supersteps embeds the previous plan into
      // the next one (pend is referenced several times per step), so plan
      // trees grow exponentially with generations. (An SQL-cached handoff of
      // the just-written frontier was tried and reverted: recache-on-write
      // hits a Spark internal NPE, and the parquet re-read it saves is tens
      // of ms against the OS page cache.)
      refreshTrapSet(gen) // cadence-gated; no-op unless a job opted in
      val frontier = spark.read.schema(frontierSchema).parquet(ckpt.frontierPath(gen))
        .select("jobId", "url", "urlNorm", "host", "depth", "priority", "parentUrl", "attempt")
        .as[FrontierEntry]
      val madeProgress = phase(gen, "superstep-total") { superstep(gen, frontier) }
      if (!madeProgress) {
        // nothing schedulable (e.g., zero politeness budget): finalize rest
        progress = progress.map { case (j, p) =>
          if (p.finalized) (j, p) else (j, p.copy(finalized = true, finalizeReason = "stalled"))
        }
      } else phase(gen, "compact") { maybeCompactSeen(gen) }
      gen += 1
      generation = gen
      applyCancellations()
      applyExpiry()
    }
  }

  /** Job-TTL sweep at the superstep barrier (the analog of Worker.ts's
    * periodic expired-pending cleanup; TTL default 3h as in the reference's
    * jobExpireAt column default). Jobs with createdAtMs == 0 never expire. */
  private def applyExpiry(): Unit = {
    val now = settings.clockMs()
    progress = progress.map { case (j, p) =>
      val c = configs(j)
      if (!p.finalized && c.createdAtMs > 0 && now > c.createdAtMs + settings.jobTtlMs)
        (j, p.copy(finalized = true, finalizeReason = "expired"))
      else (j, p)
    }
  }

  /** Cancellation takes effect at the next superstep barrier: jobs with a
    * cancel marker (Graft.cancel / DELETE /v1/crawl/:jobId,
    * CrawlController.ts:279-305) finalize with reason "cancelled" and stop
    * being scheduled. Markers persist, so a resume also honors them. */
  private def applyCancellations(): Unit = {
    val cancelled = ckpt.cancelledJobs
    if (cancelled.nonEmpty) {
      progress = progress.map { case (j, p) =>
        if (!p.finalized && cancelled.contains(j))
          (j, p.copy(finalized = true, finalizeReason = "cancelled"))
        else (j, p)
      }
    }
  }

  /** Run one superstep over the pending frontier of `gen`.
    * Returns false when no rows could be scheduled. */
  private val timing = sys.env.contains("GRAFT_TIMING")
  private def phase[A](gen: Int, tag: String)(f: => A): A = {
    if (!timing) f
    else {
      val t = System.nanoTime()
      val r = f
      System.err.println(f"[timing] gen=$gen $tag ${(System.nanoTime() - t) / 1e9}%.2f s")
      r
    }
  }

  /** Small steps run with AQE off, restored after. Every exchange AQE
    * materializes is a separate job round-trip on the driver; a small-step
    * generation has ~6 exchanges of a few hundred rows whose plans are
    * already final (joins hint-pinned broadcast, partitioning coalesced by
    * the gates), so runtime re-planning can improve nothing and measurably
    * costs ~0.25 s/generation in stage-boundary latency. Wide steps — the
    * 100 TB shape — keep AQE for skew-join splitting and partition
    * coalescing. Scoped set + restore: the engine owns the session for the
    * duration of the superstep (run() is single-threaded per engine).
    */
  private def superstep(gen: Int, frontier: Dataset[FrontierEntry]): Boolean =
    if (lastPendTotal >= settings.saltMinBatch) superstepBody(gen, frontier)
    else {
      val key = "spark.sql.adaptive.enabled"
      val was = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      try superstepBody(gen, frontier)
      finally was match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  private def superstepBody(gen: Int, frontier: Dataset[FrontierEntry]): Boolean = {
    val t0 = System.currentTimeMillis()
    val tSched = System.nanoTime()
    val active = activeJobs
    val activeIds = active.map(_.jobId)
    val pend = frontier.filter($"jobId".isin(activeIds: _*))

    // ---------------------------------------------------------- scheduling
    val ordCols = Seq(col("depth"), col("priority"), col("urlNorm"))

    // Per-job numeric lookups go through a UDF over a broadcast map, NOT
    // element_at(typedLit(map)): a typedLit embeds the (generation-varying)
    // map into the generated code, so every superstep produced a brand-new
    // codegen source and paid a wholestage recompilation (~100-200 ms per
    // stage per generation). The UDF body is byte-identical across
    // generations -> codegen cache hits.
    def jobLookup(m: Map[String, Long]) = {
      val b = spark.sparkContext.broadcast(m)
      udf((j: String) => b.value(j))
    }

    // politeness: top hostBudget per (job, host), limit: top remaining per
    // job (P6/W1), both in canonical order, then per-job seq assignment.
    //
    // SMALL steps (pending < saltMinBatch) take a one-exchange plan: shuffle
    // the pending set by jobId once and run the whole schedule — canonical
    // sort, per-host budget walk, per-job limit prefix, seq numbering — as a
    // single in-memory pass per job partition (a job's pending rows are
    // bounded by the gate, so the sort is bounded). This replaces three
    // exchanges, two window sorts and a range-sort sampling job per
    // generation; at ~15 BFS generations per crawl that fixed latency was
    // most of q24's floor. Semantics are identical by construction: the
    // limit cut is a prefix (in canonical order) of the politeness
    // survivors, which is exactly what the ordered walk emits.
    //
    // LARGE steps keep the two-phase salted windows (hot-host skew safety)
    // + distributed sort + manual two-pass indexing: deterministic under
    // any parallelism, no single-partition window, no driver data.
    val smallStep = lastPendTotal < settings.saltMinBatch
    val needPoliteness = active.exists(c => c.hostBudgetPerStep != Int.MaxValue ||
      (c.crawlDelayEpochSeconds > 0 && robotsRules.nonEmpty))
    val remaining = active.map { c =>
      val p = progress(c.jobId)
      c.jobId -> (if (c.limit > 0) math.max(0L, c.limit.toLong - p.done) else Long.MaxValue)
    }.toMap
    val needLimit = remaining.values.exists(_ != Long.MaxValue)
    val offsets = seqOffsets
    val offB = spark.sparkContext.broadcast(offsets)

    // (rdd to build seqed from, the persisted rdd to release, count, lineage)
    // SMALL steps defer the batch count (-1 sentinel): the whole schedule is
    // a single narrow coalesce(1) pass (pending is gate-bounded), NO count
    // job runs before the fetch — the count rides the results write's
    // accumulator (footer-reconciled), the per-partition lineage comes from
    // the committed results files themselves, and the join strategy is
    // unconditionally broadcast (batch <= pending < saltMinBatch <=
    // broadcastBatchMax). Saves one Spark job + one AQE shuffle stage per
    // generation — at ~15 BFS generations that was ~15% of q24's floor.
    val (seqedBase, seqedCache, batchCount, lineage) =
      if (smallStep) {
        val bb = budgetB
        val wb = wavesB
        val cfgBv = cfgB
        val idxBv = delayIdxB
        val remB = spark.sparkContext.broadcast(remaining)
        val scheduled = pend.coalesce(1).mapPartitions { it =>
          val budgets = bb.value; val waves = wb.value; val rem = remB.value; val off = offB.value
          val cfgs = cfgBv.value; val delayIdx = idxBv.value
          it.toArray.groupBy(_.jobId).iterator.flatMap { case (j, rs) =>
            val base = budgets(j)
            val wavesJ = waves(j)
            val cfg = cfgs(j)
            val room = rem(j)
            // politeness: wave w = canonical rank within host / budget, kept
            // while w < politenessWaves; then the per-job remaining-limit cut
            // is a prefix in WAVE-MAJOR canonical order (seq follows it). At
            // waves=1 this is the classic single budget walk. Budget is
            // per (job, host): hostBudgetPerStep capped by the robots
            // Crawl-delay quota when opted in (memoized per host).
            val sorted = rs.sortBy(e => (e.depth, e.priority, e.urlNorm))
            val hostN = scala.collection.mutable.HashMap[String, Long]()
            val hostB = scala.collection.mutable.HashMap[String, Long]()
            def budgetOf(h: String): Long = hostB.getOrElseUpdate(h,
              CrawlEngine.effectiveBudgetIndexed(cfg, delayIdx.getOrElse(j, Map.empty), base, h))
            val staged = scala.collection.mutable.ArrayBuffer[(Long, FrontierEntry)]()
            sorted.foreach { e =>
              // group key = host, or eTLD+1 under politenessByDomain
              val pk = CrawlEngine.politeKey(cfg, e.host)
              val budget = budgetOf(pk)
              val cap =
                if (budget >= Int.MaxValue.toLong) Long.MaxValue
                else budget * wavesJ
              val c = hostN.getOrElse(pk, 0L)
              if (c < cap) {
                hostN(pk) = c + 1
                staged += (((if (budget >= Int.MaxValue.toLong) 0L else c / budget), e))
              }
            }
            val waveSorted =
              staged.sortBy { case (w, e) => (w, e.depth, e.priority, e.urlNorm) }
            var taken = 0L
            val out = Seq.newBuilder[CrawlEngine.SeqEntry]
            waveSorted.foreach { case (_, e) =>
              if (taken < room) {
                out += CrawlEngine.SeqEntry(e.jobId, e.url, e.urlNorm, e.host, e.depth,
                  e.priority, e.parentUrl, e.attempt, off(j) + taken)
                taken += 1
              }
            }
            out.result()
          }
        }.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (scheduled, scheduled, -1L, Map.empty[String, Long])
      } else {
        // Wave-major scheduling (politenessWaves): politeness keeps the top
        // waves*budget per (job, host) with wave = canonical-rank/budget; the
        // limit cut and the seq sort then order by (wave, canonical). At
        // waves=1, __wave is constant 0 and this is the round-2 plan exactly.
        val polite =
          if (!needPoliteness) pend.toDF().withColumn("__wave", lit(0L))
          else {
            val bb = budgetB
            val wb = wavesB
            val cfgBv = cfgB
            val idxBv = delayIdxB
            // per-(job, host) budget: hostBudgetPerStep capped by the robots
            // Crawl-delay quota when the job opted in. The opted-out path
            // (epoch <= 0, every existing caller) is a single branch to the
            // broadcast map — byte-identical budgets to the round-2 plan.
            // group key = host, or eTLD+1 under politenessByDomain (the
            // same politeKey both the fast path and the oracle use)
            val keyCol = udf((j: String, h: String) =>
              CrawlEngine.politeKey(cfgBv.value(j), h)).apply($"jobId", $"host")
            val budgetCol = udf((j: String, k: String) =>
              CrawlEngine.effectiveBudgetIndexed(
                cfgBv.value(j), idxBv.value.getOrElse(j, Map.empty), bb.value(j), k))
              .apply($"jobId", $"__pk")
            val capCol = udf { (j: String, k: String) =>
              val b = CrawlEngine.effectiveBudgetIndexed(
                cfgBv.value(j), idxBv.value.getOrElse(j, Map.empty), bb.value(j), k)
              if (b >= Int.MaxValue.toLong) Long.MaxValue else b * wb.value(j)
            }.apply($"jobId", $"__pk")
            val w2 = Window.partitionBy($"jobId", $"__pk").orderBy(ordCols: _*)
            val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
            val w1 = Window.partitionBy($"jobId", $"__pk", salt).orderBy(ordCols: _*)
            pend.toDF()
              .withColumn("__pk", keyCol)
              .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= capCol).drop("__r1")
              .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= capCol)
              .withColumn("__b", budgetCol)
              .withColumn("__wave",
                when($"__b" >= Int.MaxValue.toLong, 0L)
                  .otherwise(expr("(CAST(__r2 AS BIGINT) - 1L) div __b")))
              .drop("__r2", "__b", "__pk")
          }
        val waveOrd = col("__wave") +: ordCols
        val batchDf =
          if (!needLimit) polite
          else {
            val remCol = jobLookup(remaining)($"jobId")
            val w2 = Window.partitionBy($"jobId").orderBy(waveOrd: _*)
            val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
            val w1 = Window.partitionBy($"jobId", salt).orderBy(waveOrd: _*)
            polite
              .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= remCol).drop("__r1")
              .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= remCol).drop("__r2")
          }
        val sortedDf = batchDf
          .orderBy(col("jobId") +: waveOrd: _*)
          .drop("__wave")
        capturePlan("schedule-wide", sortedDf)
        val sortedBase = sortedDf.as[FrontierEntry].rdd
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val partStats: Array[(Int, Long, Map[String, Long])] = phase(gen, "seq-assign") {
          sortedBase.mapPartitionsWithIndex { case (pi, it) =>
            var n = 0L
            val firsts = scala.collection.mutable.Map[String, Long]()
            it.foreach { fe =>
              if (!firsts.contains(fe.jobId)) firsts(fe.jobId) = n // local pos
              n += 1
            }
            Iterator.single((pi, n, firsts.toMap))
          }.collect()
        }
        // partition offset = total rows in lower-numbered partitions
        val byPi = partStats.sortBy(_._1)
        val partOffsets: Map[Int, Long] = {
          var acc = 0L
          byPi.map { case (pi, n, _) => val o = pi -> acc; acc += n; o }.toMap
        }
        val firstIdxPerJob: Map[String, Long] = byPi.iterator
          .flatMap { case (pi, _, firsts) => firsts.map { case (j, local) => j -> (partOffsets(pi) + local) } }
          .toSeq.groupMapReduce(_._1)(_._2)(math.min)
        val firstB = spark.sparkContext.broadcast(firstIdxPerJob)
        val partOffB = spark.sparkContext.broadcast(partOffsets)
        val seqedRdd = sortedBase.mapPartitionsWithIndex { case (pi, it) =>
          val off = offB.value; val first = firstB.value
          var local = -1L
          val base = partOffB.value(pi)
          it.map { fe =>
            local += 1
            val i = base + local
            CrawlEngine.SeqEntry(fe.jobId, fe.url, fe.urlNorm, fe.host, fe.depth,
              fe.priority, fe.parentUrl, fe.attempt,
              off(fe.jobId) + (i - first(fe.jobId)))
          }
        }
        (seqedRdd, sortedBase, partStats.map(_._2).sum,
          partStats.map(s => s._1.toString -> s._2).toMap: Map[String, Long])
      }
    if (timing) System.err.println(f"[timing] gen=$gen sched-build ${(System.nanoTime() - tSched) / 1e9}%.2f s")
    if (batchCount == 0L) { seqedCache.unpersist(false); return false }
    val tFetchBuild = System.nanoTime()
    val seqed: Dataset[CrawlEngine.SeqEntry] = spark.createDataset(seqedBase)

    // ------------------------------------------------------------ fetch J1
    // INNER join + small anti-join for misses instead of a LEFT join: a
    // left-outer shuffled-hash join may only build on the corpus side (2 GB
    // hash table rebuilt per generation, GC-bound); the inner join builds on
    // the frontier batch and streams the cached corpus, and the 404 set is
    // recovered by an anti-join between two batch-sized frames.
    // shuffle_hash hint pins the strategy (AQE would flip between broadcast
    // and SHJ near the threshold as batch sizes cross it, with high variance);
    // build side = the hinted (batch) side, probe = partition-local cache scan
    // Small batches broadcast (the corpus is never shuffled or re-hashed;
    // each cached corpus partition probes the broadcast batch in place);
    // large batches take the shuffled-hash path with the batch as build
    // side. Both pinned by hint — AQE flip-flopping near thresholds made
    // benchmarks bimodal.
    // batchCount == -1 (deferred, small-step) implies batch < saltMinBatch
    // <= broadcastBatchMax -> broadcast unconditionally
    val fetchLeft =
      if (batchCount <= settings.broadcastBatchMax) seqed.hint("broadcast")
      else seqed.hint("shuffle_hash")
    val hit = fetchLeft
      .join(pagesPrepared, seqed("urlNorm") === pagesPrepared("__purl"), "inner")
      .drop("__purl")
    val miss = seqed.join(
        hit.select(col("jobId").as("__mj"), col("urlNorm").as("__mu")).hint("broadcast"),
        seqed("jobId") === col("__mj") && seqed("urlNorm") === col("__mu"), "left_anti")
      .withColumn("__phtml", lit(null).cast("binary"))
    val fetched = hit.unionByName(miss)
    capturePlan(if (batchCount <= settings.broadcastBatchMax) "fetch-join-broadcast"
      else "fetch-join-shuffled-hash", fetched)

    // ------------------------------------------------------- extract kernel
    // One mapPartitions pass produces ALL formats + out-links; the links
    // column rides along in the results parquet so link expansion reads the
    // materialized output instead of recomputing the kernel.
    val cfgBv = cfgB
    val genV = gen
    // A1-A3 accounting rides the extract pass as an accumulator instead of a
    // separate groupBy-collect job: the extracted stage is consumed by
    // exactly ONE action (the results write), so each task's updates are
    // merged exactly once (no stage re-execution, no speculation here).
    val statAcc = new CrawlEngine.LongMapAcc
    spark.sparkContext.register(statAcc, s"crawl-stats-gen$gen")
    val chaosV = settings.chaosAccumulatorDoubleFire
    val extracted = fetched.as[CrawlEngine.FetchedRow].mapPartitions { it =>
      val cfgs = cfgBv.value
      // chaos hook: partition 0 reports its counter updates twice — exactly
      // what a re-executed-but-already-merged task does to a transformation
      // accumulator; the footer reconciliation below must absorb it
      val dbl = chaosV && org.apache.spark.TaskContext.getPartitionId() == 0
      def bump(k: String): Unit = { statAcc.add(k -> 1L); if (dbl) statAcc.add(k -> 1L) }
      it.map { r =>
        val cfg = cfgs(r.jobId)
        val ts = java.time.Instant.now().toString
        bump(r.jobId + "\u001ffetched")
        if (r.__phtml == null) {
          val terminal = r.attempt + 1 >= cfg.maxAttempts
          if (terminal) {
            bump(r.jobId + "\u001fdone")
            bump(r.jobId + "\u001ffail")
          }
          CrawlEngine.ExtractedRow(r.jobId, r.seq, r.url, r.urlNorm, r.host, r.depth,
            r.attempt, 404, success = false, terminal = terminal, "", "", "", "", "",
            Nil, Nil, ts, 0L, genV)
        } else {
          val html = new String(r.__phtml, java.nio.charset.StandardCharsets.UTF_8)
          bump(r.jobId + "\u001fdone")
          bump(r.jobId + "\u001fsucc")
          // A4 per-page cost: 1 credit per successful page within limit (the
          // batch is limit-capped by scheduling, so every success is within
          // limit; json-extraction surcharges are an LLM non-goal)
          bump(r.jobId + "\u001fcost")
          if (cfg.parseSitemaps && graft.sources.Sitemap.isSitemap(html)) {
            // sitemap fan-out: entries (member sitemaps AND page locs) are
            // this page's out-links — index expansion is a BSP round, not
            // recursion inside the kernel. Relative locs resolve against
            // the sitemap's own URL; malformed bodies fan out nothing.
            val links =
              try graft.sources.Sitemap.parse(html).map(e =>
                if (e.url.contains("://")) e.url else UrlOps.resolve(r.url, e.url))
              catch { case _: IllegalArgumentException => Nil }
            CrawlEngine.ExtractedRow(r.jobId, r.seq, r.url, r.urlNorm, r.host, r.depth,
              r.attempt, 200, success = true, terminal = true,
              "", "", "", "", "", links, Nil, ts, 1L, genV)
          } else {
            val ex = Extractor.extract(r.url, html, cfg.formats,
              honorNofollow = cfg.honorNofollow)
            val row = CrawlEngine.ExtractedRow(r.jobId, r.seq, r.url, r.urlNorm, r.host, r.depth,
              r.attempt, 200, success = true, terminal = true,
              ex.title, ex.markdown.getOrElse(""), ex.text.getOrElse(""),
              ex.html.getOrElse(""), ex.rawHtml.getOrElse(""), ex.links,
              ex.metadata, ts, 1L, genV)
            // per-page hook (CrawlConfig.pageHook): content fields only —
            // scheduling identity stays engine-owned (see CrawlModel)
            cfg.pageHook match {
              case Some(h) =>
                val out = h(PageResult(row.jobId, row.seq, row.url, row.urlNorm,
                  row.host, row.depth, row.attempt, row.status, row.success,
                  row.terminal, row.title, row.markdown, row.text, row.htmlClean,
                  row.links.length, row.generation))
                row.copy(title = out.title, markdown = out.markdown,
                  text = out.text, htmlClean = out.htmlClean)
              case None => row
            }
          }
        }
      }
    }
    // persist-then-write: the write job materializes the cache in the same
    // pass; link expansion and the retry/deferral joins read the cache
    // (columnar, pruned) instead of re-reading the parquet just written
    extracted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (timing) System.err.println(f"[timing] gen=$gen fetch-build ${(System.nanoTime() - tFetchBuild) / 1e9}%.2f s")
    // SMALL steps run the results write CONCURRENTLY with link expansion +
    // the frontier write (the two barriers are each ~1/3 of the superstep
    // floor and share no data dependency: expansion reads the `extracted`
    // CACHE, accounting reads the committed parquet footers, and the
    // progress fields expansion consumes — enqueued caps — are not the ones
    // accounting writes — done/succ/fail/seqOffsets, all consumed at the
    // NEXT generation's scheduling). Cache coherence under two concurrent
    // jobs is Spark's block-level write lock: whichever job's task reaches
    // an uncached partition first computes and caches it, the other blocks
    // then reads — each partition (and so each accumulator update) is
    // computed exactly once, and the footer reconciliation below remains the
    // safety net. Wide steps keep sequential barriers: their writes are
    // bandwidth-bound, so overlap buys nothing and halves each job's
    // effective cores.
    val doResultsWrite = () => phase(gen, "fetch-extract-write") {
      extracted.write.mode("overwrite").parquet(ckpt.resultsPath(gen))
    }
    val resultsFut: Option[java.util.concurrent.Future[Unit]] =
      if (smallStep) {
        val sess = spark
        Some(CrawlEngine.resultsWritePool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            // planning in this thread resolves SQLConf through the
            // thread-local active session — pin it, or shuffle.partitions
            // and the small-step AQE toggle fall back to defaults
            org.apache.spark.sql.SparkSession.setActiveSession(sess)
            doResultsWrite()
          }
        }))
      } else { doResultsWrite(); seqedCache.unpersist(false); None }

    val res = extracted.toDF()

    // --------------------------------------------------- accounting (A1-A3)
    // Exactly-once repair (VERDICT r2 #1): these counters rode a
    // *transformation*, so a re-executed task (speculation, fetch-failure
    // stage retry, evicted-cache rebuild) merges its updates twice. The
    // committed parquet footers are the ground truth row count: equality
    // proves the accumulator exact (over-count is the only failure mode —
    // updates ride task success and only successful tasks commit files).
    // On mismatch, recompute the per-job counters from the committed files,
    // so seqOffsets and the finalize decision always derive from committed
    // state, never from an inflated counter.
    val hconf = spark.sessionState.newHadoopConf()
    var stats: Map[String, Long] = null
    var statJobs: Set[String] = null
    var actualBatch: Long = -1L
    var lineageOut: Map[String, Long] = null
    def stat(j: String, k: String): Long = stats.getOrElse(j + "\u001f" + k, 0L)
    def settleResults(): Unit = {
      val tAcct = System.nanoTime()
      val resultFileRows = ckpt.committedFileRows(ckpt.resultsPath(gen), hconf)
      val committedRows = resultFileRows.map(_._2).sum
      stats = {
        val acc = statAcc.value
        val accFetched = acc.iterator.collect { case (k, v) if k.endsWith("\u001ffetched") => v }.sum
        if (accFetched == committedRows) acc
        else {
          System.err.println(s"[crawl] gen=$gen results accumulator total $accFetched != " +
            s"committed $committedRows (task re-execution); recomputing from committed parquet")
          spark.read.parquet(ckpt.resultsPath(gen))
            .groupBy($"jobId")
            .agg(count(lit(1)).as("f"),
              sum(when($"terminal", 1L).otherwise(0L)).as("d"),
              sum(when($"success", 1L).otherwise(0L)).as("s"),
              sum(when($"terminal" && !$"success", 1L).otherwise(0L)).as("x"),
              sum($"cost").as("c"))
            .collect().iterator.flatMap { r =>
              val j = r.getString(0)
              Seq(j + "\u001ffetched" -> r.getLong(1), j + "\u001fdone" -> r.getLong(2),
                j + "\u001fsucc" -> r.getLong(3), j + "\u001ffail" -> r.getLong(4),
                j + "\u001fcost" -> r.getLong(5))
            }.toMap
        }
      }
      statJobs = stats.keysIterator.map(_.takeWhile(_ != '\u001f')).toSet
      statJobs.foreach { j =>
        val p = progress(j)
        progress += j -> p.copy(
          done = p.done + stat(j, "done"),
          succeeded = p.succeeded + stat(j, "succ"),
          failed = p.failed + stat(j, "fail"),
          creditsUsed = p.creditsUsed + stat(j, "cost"))
        seqOffsets += j -> (seqOffsets(j) + stat(j, "fetched"))
      }
      // Deferred batch count (small-step path): the committed results rows
      // ARE the batch — an empty write means nothing was schedulable, the
      // same exit condition as the old pre-fetch zero check. Lineage likewise
      // comes from the committed files (exactly-once by construction).
      actualBatch = if (batchCount >= 0L) batchCount else committedRows
      lineageOut =
        if (batchCount >= 0L) lineage
        else resultFileRows.map { case (f, n) => f -> n }.toMap
      if (timing) System.err.println(f"[timing] gen=$gen acct ${(System.nanoTime() - tAcct) / 1e9}%.2f s")
    }
    // Sequential path settles (and can exit empty) before expansion, exactly
    // as before; the overlapped path settles after the frontier write joins.
    if (resultsFut.isEmpty) {
      settleResults()
      if (actualBatch == 0L) { extracted.unpersist(false); return false }
    }

    val tExp = System.nanoTime()
    // ------------------------------------------------- link expansion P2-P5
    val enqueuedSoFar = progress.map { case (j, p) => j -> p.enqueued }
    val enqB = spark.sparkContext.broadcast(enqueuedSoFar)
    // crossed trap families (empty unless a job opted in) — gate candidates
    // BEFORE dedup/seen/cap so a trapped family costs no downstream work
    val trapBv = spark.sparkContext.broadcast(trapCrossed)
    val robotsBv = robotsB
    val candRaw = res
      .filter($"success" && $"terminal")
      .select($"jobId", $"seq", $"url".as("parentUrl"), $"depth",
        posexplode($"links").as(Seq("idx", "childUrl")))
      .as[CrawlEngine.CandRow]
      .mapPartitions { it =>
        val cfgs = cfgBv.value
        val robots = robotsBv.value
        val enqueued = enqB.value
        val traps = trapBv.value
        val pats = new scala.collection.mutable.HashMap[String, (Seq[java.util.regex.Pattern], Seq[java.util.regex.Pattern])]()
        it.flatMap { c =>
          val cfg = cfgs(c.jobId)
          val nd = c.depth + 1
          if (nd > cfg.maxDepth) None
          else if (enqueued(c.jobId) >= cfg.limit && cfg.limit > 0) None
          else if (c.idx >= cfg.limit && cfg.limit > 0) None // per-page enqueue cap (Crawlee limit)
          else if (!cfg.inScope(c.childUrl)) None
          else {
            val (inc, exc) = pats.getOrElseUpdate(c.jobId,
              (cfg.includePaths.map(UrlOps.compilePattern), cfg.excludePaths.map(UrlOps.compilePattern)))
            val included = cfg.includePaths.isEmpty ||
              UrlOps.matchesAny(c.childUrl, inc, cfg.includePaths)
            // exclude list also excludes the current page URL (Base.ts:348-353)
            val excluded = (cfg.excludePaths.nonEmpty &&
              (UrlOps.matchesAny(c.childUrl, exc, cfg.excludePaths) || c.childUrl == c.parentUrl))
            if (!included || excluded) None
            else {
              val h = UrlOps.host(c.childUrl)
              val robotsOk = !cfg.respectRobots ||
                robots.get(h).forall(r => Robots.allowedUrl(r, cfg.userAgent, c.childUrl))
              if (!robotsOk) None
              else {
                val norm = UrlOps.normalize(c.childUrl)
                // trap gate (opt-in): the family key is derived from the
                // NORMALIZED url on both this side and the refresh side
                if (cfg.trapMaxUrls > 0 &&
                    traps.contains(graft.frontier.Traps.familyKey(c.jobId, norm)))
                  None
                else Some(FrontierEntry(c.jobId, c.childUrl, norm, h,
                  nd, cfg.priorityOf.map(f => f(norm))
                    .getOrElse(c.seq * 4096L + math.min(c.idx, 4095L)),
                  c.parentUrl, 0))
              }
            }
          }
        }
      }

    // The bloom pre-filter pays for itself only when the candidate set is
    // large (it kills shuffle width ahead of the exact anti-join). Below
    // `bloomMinBatch` scheduled rows the filter costs more than the shuffle
    // it saves, so small supersteps go straight to the exact anti-join.
    // batchCount == -1 means the count was deferred to the write barrier
    // (small-step plan) — gate on the previous pending total instead, the
    // same surrogate that chose the small-step plan. Comparing the raw -1
    // would make `bloomMinBatch = 0` (the test override that forces the
    // sidecar probe path at test-sized batches) silently inert on every
    // small step, leaving the probe path unexercised below prod scale.
    val useBloom =
      (if (batchCount >= 0L) batchCount else lastPendTotal) >= settings.bloomMinBatch
    val (seenBuckets, tailPaths) = ckpt.seenSources(gen)
    val bucketPaths = seenBuckets.map(ckpt.seenBucketPath)
    val bucketsDfOpt: Option[DataFrame] =
      if (bucketPaths.isEmpty) None
      else Some(bucketPaths.map(p => spark.read.parquet(p).select($"jobId", $"urlNorm"))
        .reduce(_ unionByName _))
    val tailDfOpt: Option[DataFrame] =
      if (tailPaths.isEmpty) None
      else Some(spark.read.schema(frontierSchema).parquet(tailPaths: _*)
        .where($"__fresh").select($"jobId", $"urlNorm"))
    val seenDfOpt = (bucketsDfOpt.toSeq ++ tailDfOpt.toSeq).reduceOption(_ unionByName _)
    // enqueue-cap rooms (Base.ts:312-325 / enqueueLinks limit): never let a
    // job's total enqueued exceed its limit; canonical-first wins
    val capMap = active.map { c =>
      val room = if (c.limit > 0) math.max(0L, c.limit.toLong - progress(c.jobId).enqueued) else Long.MaxValue
      c.jobId -> room
    }.toMap
    val capNeeded = active.exists(c => c.limit > 0)
    // sidecar probing engages once compaction has produced filter-carrying
    // buckets; before that (or below bloomMinBatch) everything goes to the
    // exact anti-join, whose right side is then only the small tail
    val sidecarProbe = settings.seenFilter == "sidecar" && useBloom && bucketPaths.nonEmpty
    if (sidecarProbe) sidecarProbeSteps += 1
    val enqueuedTotal = progress.values.map(_.enqueued).sum
    // SMALL steps with a seen set small enough to broadcast take a
    // one-exchange expansion (same shape as the scheduling fast path):
    // shuffle candidates by jobId once, broadcast-anti-join the exact seen
    // set (preserves the jobId clustering), then dedup (canonical-min per
    // urlNorm) + canonical-order cap in a single in-memory pass per job.
    // Replaces the dedup exchange + cap window exchange + two sorts.
    // Gated TIGHTER than the scheduling fast path: a job's candidates all
    // flow through one task here, and candidates ~ pending x branching —
    // at 16k pending x 16 links that single task serializes 256k rows,
    // which measurably throttled the 32-core scaling bench.
    val fastExpand = lastPendTotal < settings.fastExpandMaxPend &&
      enqueuedTotal < settings.broadcastBatchMax

    val fresh: Dataset[FrontierEntry] =
      if (fastExpand) {
        // coalesce, not repartition: the gate already bounds candidates to a
        // single comfortable task, and a narrow coalesce skips the AQE
        // shuffle-stage round trip a repartition pays (one per generation)
        val base = candRaw.coalesce(1)
        val afterSeen = seenDfOpt match {
          case Some(seenDf) =>
            base.join(broadcast(seenDf), Seq("jobId", "urlNorm"), "left_anti").as[FrontierEntry]
          case None => base
        }
        val capB = spark.sparkContext.broadcast(capMap)
        afterSeen.mapPartitions { it =>
          val cap = capB.value
          it.toArray.groupBy(_.jobId).iterator.flatMap { case (j, rs) =>
            val best = scala.collection.mutable.HashMap[String, FrontierEntry]()
            rs.foreach { e =>
              best.get(e.urlNorm) match {
                case Some(c) if Ordering[(Int, Long, String, String)].lteq(
                    (c.depth, c.priority, c.parentUrl, c.url),
                    (e.depth, e.priority, e.parentUrl, e.url)) => ()
                case _ => best(e.urlNorm) = e
              }
            }
            val room = cap.getOrElse(j, Long.MaxValue)
            val sorted = best.values.toArray.sortBy(e => (e.depth, e.priority, e.urlNorm))
            (if (room >= sorted.length) sorted else sorted.take(room.toInt)).iterator
          }
        }
      } else {
        // in-batch dedup: canonical-min entry per (jobId, urlNorm) (U1).
        // One hash shuffle + a partition-local sorted first-per-key scan. In
        // sidecar mode the shuffle keys on shard-of-key instead — equal keys
        // still co-locate (the shard is a pure function of the key), and each
        // task then probes only its own shards' sidecar filters (executor-
        // cached across supersteps) rather than every shard of every bucket.
        val dedupKeyed =
          if (sidecarProbe) {
            // BIGINT-only arithmetic (ANSI-safe); for power-of-two shard
            // counts pmod takes the same low bits SidecarBlooms.shardOf does,
            // so a task's rows map to exactly the shard filters it will load
            val s = settings.sidecarShards
            candRaw.repartition(expr("pmod(xxhash64(concat(jobId, '-', urlNorm)) ^ " +
              s"shiftrightunsigned(xxhash64(concat(jobId, '-', urlNorm)), 32), ${s}L)"))
          } else candRaw.repartition($"jobId", $"urlNorm")
        val cand = dedupKeyed
          .sortWithinPartitions($"jobId", $"urlNorm", $"depth", $"priority", $"parentUrl", $"url")
          .mapPartitions { it =>
            var lastJob: String = null
            var lastNorm: String = null
            it.filter { e =>
              val keep = e.jobId != lastJob || e.urlNorm != lastNorm
              if (keep) { lastJob = e.jobId; lastNorm = e.urlNorm }
              keep
            }
          }

        // ------------------------------- seen-set dedup: bloom + exact (J2)
        // driver mode: the broadcast SeenBloom covers EVERY seen key, so
        // bloom negatives are final. sidecar mode (VERDICT r2 #2): per-bucket
        // shard filters live next to the compacted seen parquet and are
        // probed executor-locally — the driver never holds any filter — but
        // they cover only bucketed generations, so bloom negatives still take
        // an exact anti-join against the (small, recent) frontier tail.
        val tagged =
          if (sidecarProbe) {
            val hcB = hadoopConfB
            // task-memoized probe (one (bucket, shard) filter load per task —
            // the shard-keyed repartition above means only a handful); the
            // missing-file => maybe-seen contract lives in SidecarBlooms,
            // spec-pinned there, not re-implemented here
            val probe = graft.frontier.SidecarBlooms.taskLocalProbe(
              bucketPaths.toArray, settings.sidecarShards, seenNonce,
              () => hcB.value.value)
            val mightContain = udf { (jobId: String, urlNorm: String) =>
              probe(SeenBloom.hash64(jobId + "-" + urlNorm))
            }
            cand.withColumn("__maybe", mightContain($"jobId", $"urlNorm"))
          } else if (useBloom && settings.seenFilter == "driver") {
            val bloomB = spark.sparkContext.broadcast(bloom)
            val mightContain = udf { (jobId: String, urlNorm: String) =>
              bloomB.value.mightContain(jobId + "-" + urlNorm)
            }
            cand.withColumn("__maybe", mightContain($"jobId", $"urlNorm"))
          } else cand.withColumn("__maybe", lit(true))
        val definitelyNew0 = tagged.filter(!$"__maybe").drop("__maybe").as[FrontierEntry]
        val positives = tagged.filter($"__maybe").drop("__maybe").as[FrontierEntry]
        val survivors = seenDfOpt match {
          case None => positives
          case Some(seenDf) =>
            positives.join(seenDf, Seq("jobId", "urlNorm"), "left_anti").as[FrontierEntry]
        }
        val definitelyNew =
          if (sidecarProbe) tailDfOpt match {
            case Some(t) => definitelyNew0.join(t, Seq("jobId", "urlNorm"), "left_anti").as[FrontierEntry]
            case None => definitelyNew0
          } else definitelyNew0
        var out = definitelyNew.unionByName(survivors)
        if (capNeeded) {
          val capCol = jobLookup(capMap)($"jobId")
          val w2 = Window.partitionBy($"jobId").orderBy(ordCols: _*)
          val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
          val w1 = Window.partitionBy($"jobId", salt).orderBy(ordCols: _*)
          out = out.toDF()
            .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= capCol).drop("__r1")
            .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= capCol).drop("__r2")
            .as[FrontierEntry]
        }
        capturePlan("expand-wide", out)
        out
      }
    if (fastExpand) capturePlan("expand-fast", fresh)

    // next frontier = (pending - batch) ∪ retries ∪ fresh.
    // Deferrals and retries come out of ONE left-outer join of the pending
    // set against the batch's result keys (unique per (jobId, urlNorm)):
    // unmatched rows defer unchanged, matched non-terminal rows retry with
    // attempt+1 (priority unchanged, so the canonical order is preserved),
    // matched terminal rows leave the frontier. Build side = the batch-sized
    // key set (broadcast below the threshold, pinned SHJ above — the pending
    // set is never the build side).
    val resKeys = res.select($"jobId".as("__rj"), $"urlNorm".as("__ru"),
      $"terminal".as("__rterm"), ($"attempt" + 1).as("__rnext"))
    val resKeysHinted =
      if (batchCount <= settings.broadcastBatchMax) resKeys.hint("broadcast")
      else resKeys.hint("shuffle_hash")
    val carried = pend.toDF()
      .join(resKeysHinted, $"jobId" === $"__rj" && $"urlNorm" === $"__ru", "left_outer")
      .filter($"__rterm".isNull || !$"__rterm")
      .withColumn("attempt", when($"__rterm".isNotNull, $"__rnext").otherwise($"attempt"))
      .select($"jobId", $"url", $"urlNorm", $"host", $"depth", $"priority", $"parentUrl", $"attempt")
      .as[FrontierEntry]

    if (timing) System.err.println(f"[timing] gen=$gen plan-build ${(System.nanoTime() - tExp) / 1e9}%.2f s")
    // One write commits the whole step's frontier state: deferred + retries
    // + fresh rows, with fresh flagged `__fresh` (the seen table IS the
    // flagged frontier history — no separate seen write). Three per-job
    // signals ride the same action as accumulators instead of three separate
    // jobs: pending counts (finalize decision), fresh counts (enqueued
    // accounting), and the 64-bit hashes of fresh keys (driver-side bloom
    // insert — see SeenBloom scaladoc). The stage is consumed by exactly
    // this one action, so updates merge exactly once.
    val pendAcc = new CrawlEngine.LongMapAcc
    val freshAcc = new CrawlEngine.LongMapAcc
    val hashAcc = new CrawlEngine.LongsAcc
    spark.sparkContext.register(pendAcc, s"crawl-pending-gen$gen")
    spark.sparkContext.register(freshAcc, s"crawl-fresh-gen$gen")
    spark.sparkContext.register(hashAcc, s"crawl-hashes-gen$gen")
    val needHashes = settings.seenFilter == "driver" // sidecar mode ships no hashes back
    val nextFrontier = carried.map(CrawlEngine.FrontierRowF.of(_, fresh = false))
      .unionByName(fresh.map(CrawlEngine.FrontierRowF.of(_, fresh = true)))
      .mapPartitions { it =>
        val dbl = chaosV && org.apache.spark.TaskContext.getPartitionId() == 0
        it.map { r =>
          pendAcc.add(r.jobId -> 1L)
          if (dbl) pendAcc.add(r.jobId -> 1L)
          if (r.__fresh) {
            freshAcc.add(r.jobId -> 1L)
            if (needHashes) hashAcc.add(SeenBloom.hash64(r.jobId + "-" + r.urlNorm))
            if (dbl) {
              freshAcc.add(r.jobId -> 1L)
              if (needHashes) hashAcc.add(SeenBloom.hash64(r.jobId + "-" + r.urlNorm))
            }
          }
          r
        }
      }
    // Small steps coalesce the frontier write (no shuffle): a ~1k-row
    // frontier written as 32+ files makes every later read of it — next
    // gen's frontier scan plus up to compactEvery tail scans per anti-join —
    // pay per-file listing/footer latency. Gated on fastExpandMaxPend, not
    // saltMinBatch: coalesce collapses the whole post-shuffle expansion
    // stage to 4 tasks, which is only safe when candidates are small too.
    val frontierOut =
      if (lastPendTotal < settings.fastExpandMaxPend) nextFrontier.coalesce(4) else nextFrontier
    phase(gen, "frontier-write") { frontierOut.write.mode("overwrite").parquet(ckpt.frontierPath(gen + 1)) }
    // Overlapped path: join the concurrent results write, then settle the
    // accounting (progress/seqOffsets/finalize inputs) before anything below
    // consumes it. An empty batch exits here — one generation later than the
    // sequential path's pre-expansion exit, but the expansion it ran was
    // empty and the manifest is not committed, so resume/trace see the
    // identical crawl.
    resultsFut.foreach { f =>
      try f.get()
      catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      seqedCache.unpersist(false)
      settleResults()
    }
    val tPost = System.nanoTime()
    extracted.unpersist(false)
    if (actualBatch == 0L) return false
    // Same footer reconciliation as the results barrier: the pending /
    // fresh / hash counters rode the frontier write; a re-executed task
    // inflates them (duplicate bloom hashes are harmless — insertion is an
    // idempotent OR — but enqueued accounting and the finalize decision are
    // not). Recompute from the committed frontier parquet on mismatch.
    val (pendCounts, freshCounts, freshHashes) = {
      val p0 = pendAcc.value
      val committedRows = ckpt.committedRowCount(ckpt.frontierPath(gen + 1), hconf)
      if (p0.values.sum == committedRows) (p0, freshAcc.value, hashAcc.value)
      else {
        System.err.println(s"[crawl] gen=$gen frontier accumulator total ${p0.values.sum} != " +
          s"committed $committedRows (task re-execution); recomputing from committed parquet")
        val fr = spark.read.schema(frontierSchema).parquet(ckpt.frontierPath(gen + 1))
        val rows = fr.groupBy($"jobId").agg(count(lit(1)).as("p"),
          sum(when($"__fresh", 1L).otherwise(0L)).as("fr")).collect()
        // the per-URL hash rebuild collects one generation's FRESH
        // (jobId, urlNorm) strings — inherent to driver-broadcast seen mode
        // (that mode holds a hash per fresh URL by definition, so this is
        // no bigger than the filter it repairs). The sidecar mode — the
        // 10^9-10^10-key deployment shape — never ships hashes to the
        // driver (needHashes=false) and skips this collect entirely: its
        // recovery is the J-row aggregate above alone.
        val hs = if (!needHashes) Nil
          else fr.where($"__fresh").select($"jobId", $"urlNorm").as[(String, String)]
            .collect().map { case (j, u) => SeenBloom.hash64(j + "-" + u) }.toSeq
        (rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
          rows.map(r => r.getString(0) -> r.getLong(2)).toMap, hs)
      }
    }
    lastPendTotal = pendCounts.values.sum
    if (needHashes) freshHashes.foreach(bloom.putHash)
    freshCounts.foreach { case (j, n) =>
      progress += j -> progress(j).copy(enqueued = progress(j).enqueued + n)
    }
    progress = progress.map { case (j, p) =>
      if (p.finalized) (j, p)
      else {
        val cfg = configs(j)
        val (fin, reason) = p.shouldFinalize(cfg.limit, pendCounts.getOrElse(j, 0L))
        (j, if (fin) p.copy(finalized = true, finalizeReason = reason) else p)
      }
    }

    if (timing) System.err.println(f"[timing] gen=$gen post ${(System.nanoTime() - tPost) / 1e9}%.2f s")
    phase(gen, "commit") { ckpt.commit(GenManifest(
      generation = gen,
      progress = progress.values.toSeq.sortBy(_.jobId),
      seqOffsets = seqOffsets,
      batchCount = actualBatch,
      freshCount = freshCounts.values.sum,
      partitionLineage = lineageOut,
      fetchedPages = actualBatch,
      extractedDocs = statJobs.toSeq.map(j => stat(j, "succ")).sum,
      wallMillis = System.currentTimeMillis() - t0),
      // full filter snapshot only on the compaction cadence; other
      // generations persist just the fresh-hash delta (see Checkpoint).
      // sidecar mode checkpoints NO filter state at all — its filters are
      // the per-bucket sidecar files, durable with the buckets themselves
      bloomSnapshot = if (needHashes &&
          (settings.compactEvery <= 0 || gen % math.max(1, settings.compactEvery) == 0))
        Some(bloom.serialized) else None,
      bloomDelta = if (needHashes) freshHashes else Nil) }

    true
  }

  /** Full canonical trace: (jobId, seq, url, depth, status) ordered. */
  def trace(throughGen: Int = Int.MaxValue): DataFrame = {
    val last = ckpt.lastCommitted.map(_.generation).getOrElse(-1)
    val paths = ckpt.resultPathsThrough(math.min(throughGen, last))
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
      .select("jobId", "seq", "url", "urlNorm", "depth", "attempt", "status", "success", "terminal", "generation")
      .orderBy("jobId", "seq")
  }

  def finalProgress: Map[String, JobProgress] = progress

  /** Full result rows (all formats + metadata/timestamp/cost), unprojected —
    * the data a GET /v1/crawl/:jobId results page serves. */
  def results(): org.apache.spark.sql.DataFrame = {
    val last = ckpt.lastCommitted.map(_.generation).getOrElse(-1)
    val paths = ckpt.resultPathsThrough(last)
    if (paths.isEmpty) spark.emptyDataFrame else spark.read.parquet(paths: _*)
  }

  /** The final URL-seen set (jobId, urlNorm). */
  def seenSet(): DataFrame = {
    val last = ckpt.lastCommitted.map(_.generation).getOrElse(-1)
    val (buckets, tailPaths) = ckpt.seenSources(last + 1)
    val parts: Seq[DataFrame] =
      buckets.map(b => spark.read.parquet(ckpt.seenBucketPath(b)).select($"jobId", $"urlNorm")) ++
      (if (tailPaths.nonEmpty)
         Seq(spark.read.schema(frontierSchema).parquet(tailPaths: _*)
           .where($"__fresh").select($"jobId", $"urlNorm"))
       else Nil)
    parts.reduceOption(_ unionByName _).map(_.distinct()).getOrElse(spark.emptyDataFrame)
  }
}

object CrawlEngine {
  /** Politeness grouping key: hostname, or eTLD+1 when the job opted into
    * site-granular budgets (CrawlConfig.politenessByDomain). Used by BOTH
    * schedule paths and the sequential oracle — one definition. */
  private[engine] def politeKey(cfg: CrawlConfig, host: String): String =
    if (cfg.politenessByDomain) graft.core.Psl.snapshot.registrable(host) else host

  /** Run-constant index behind the hot-path budget probes: for each job
    * that opted into the Crawl-delay quota, politeKey -> the group's max
    * Crawl-delay (most-conservative member, same rule `effectiveBudget`
    * documents). One driver-side pass over the robots map per opted-in job
    * at broadcast-refresh time; `effectiveBudgetIndexed` is then a single
    * map probe per row in BOTH politeness modes. Equivalence with the
    * direct-scan `effectiveBudget` is pinned by PolitenessDomainSpec. */
  private[engine] def crawlDelayIndex(cfgs: Map[String, CrawlConfig],
      robots: Map[String, graft.core.Robots.RobotRules]): Map[String, Map[String, Double]] =
    cfgs.collect { case (j, cfg) if cfg.crawlDelayEpochSeconds > 0 =>
      val m = scala.collection.mutable.HashMap.empty[String, Double]
      robots.foreach { case (h, r) =>
        r.crawlDelay(cfg.userAgent).foreach { d =>
          val k = politeKey(cfg, h)
          if (!m.get(k).exists(_ >= d)) m(k) = d
        }
      }
      j -> m.toMap
    }

  /** `effectiveBudget` with the group scan replaced by a probe of the
    * precomputed [[crawlDelayIndex]] entry for the job (empty map when the
    * job is absent = no robots delays). `key` is the politeKey. */
  private[engine] def effectiveBudgetIndexed(cfg: CrawlConfig,
      delayIdx: Map[String, Double], base: Long, key: String): Long =
    if (cfg.crawlDelayEpochSeconds <= 0) base
    else CrawlConfig.hostBudgetWithDelay(base, cfg.crawlDelayEpochSeconds, delayIdx.get(key))

  /** Public schedule-inspection surface for the politeness budget (C2×C8):
    * `host -> effective per-wave budget` for `cfg` under `robotsBodies`, as
    * a column transform taking the SAME politeKey + [[crawlDelayIndex]]
    * probe the engine's schedule paths take — lets capacity planning and
    * external schedulers ask "what budget would this crawl give host H"
    * without constructing an engine. Index built once driver-side and
    * broadcast; per-row cost is one map probe (plus a PSL lookup under
    * politenessByDomain). */
  def politeBudgetColumn(spark: org.apache.spark.sql.SparkSession, cfg: CrawlConfig,
      robotsBodies: Map[String, String]): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val rules = robotsBodies.map { case (h, b) => (h, graft.core.Robots.parse(b)) }
    val idx = crawlDelayIndex(Map(cfg.jobId -> cfg), rules).getOrElse(cfg.jobId, Map.empty)
    val idxB = spark.sparkContext.broadcast(idx)
    val cfgBc = spark.sparkContext.broadcast(cfg)
    val f = org.apache.spark.sql.functions.udf { (host: String) =>
      val c = cfgBc.value
      effectiveBudgetIndexed(c, idxB.value, c.hostBudgetPerStep.toLong, politeKey(c, host))
    }
    (hostCol: org.apache.spark.sql.Column) => f(hostCol)
  }

  /** Effective per-(job, politeKey) politeness budget: the job's
    * hostBudgetPerStep capped by the robots Crawl-delay quota when the job
    * opted in (CrawlConfig.crawlDelayEpochSeconds > 0; C2×C3). Pure — safe
    * inside task closures. This is the SEMANTIC DEFINITION (direct robots
    * scan), used by the sequential oracle and specs; both engine schedule
    * paths take the equivalent O(1) probe [[effectiveBudgetIndexed]]. */
  private[engine] def effectiveBudget(cfg: CrawlConfig,
      robots: Map[String, graft.core.Robots.RobotRules],
      base: Long, host: String): Long =
    if (cfg.crawlDelayEpochSeconds <= 0) base
    else {
      // `host` is the politeness key. In domain mode that key is the
      // eTLD+1 while robots rules are keyed by actual hostnames, so the
      // group's quota is the MOST CONSERVATIVE member's: max Crawl-delay
      // (= min budget) across the group's hosts — a site's strictest
      // subdomain governs the shared budget, instead of the old silent
      // fall-through to the uncapped base when no robots entry matched
      // the group key verbatim.
      val delay: Option[Double] =
        if (!cfg.politenessByDomain)
          robots.get(host).flatMap(_.crawlDelay(cfg.userAgent))
        else {
          val ds = robots.iterator.collect {
            case (h, r) if politeKey(cfg, h) == host => r.crawlDelay(cfg.userAgent)
          }.flatten.toSeq
          if (ds.isEmpty) None else Some(ds.max)
        }
      CrawlConfig.hostBudgetWithDelay(base, cfg.crawlDelayEpochSeconds, delay)
    }

  /** One daemon thread for the overlapped small-step results write. A single
    * thread (not a pool): at most one superstep runs per engine, and engines
    * in one JVM share it safely — the submit/get pair brackets each use. */
  private[engine] lazy val resultsWritePool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, "graft-results-write"); t.setDaemon(true); t
    })

  final case class Settings(
      pagesUrlColumn: String = "url",
      pagesHtmlColumn: String = "html",
      bloomShards: Int = 4,
      bloomExpectedPerShard: Long = 1000000L,
      bloomFpp: Double = 0.01,
      saltBuckets: Int = 32,
      maxGenerations: Int = 1000,
      compactEvery: Int = 8,
      // jobExpireAt default: creation + 3h (db/schemas/PostgreSQL.ts:79)
      jobTtlMs: Long = 3L * 60 * 60 * 1000,
      clockMs: () => Long = () => System.currentTimeMillis(),
      bloomMinBatch: Long = 65536L,
      // "driver": one SeenBloom lives on the driver and is broadcast into
      // the candidate filter (fine through ~1e9 keys with incremental
      // checkpoints). "sidecar": NO node ever holds the full filter — each
      // seen-compaction bucket carries per-shard bloom files probed
      // executor-locally after a shard-keyed candidate shuffle (the 1e10-key
      // deployment shape; see SidecarBlooms).
      seenFilter: String = "driver",
      sidecarShards: Int = 32,
      // single-task-per-job ceiling for the one-pass expansion fast path
      // (candidates ~ pending x branching must fit one task comfortably)
      fastExpandMaxPend: Long = 8192L,
      // leveled seen compaction: buckets per level before they merge upward
      levelFanout: Int = 4,
      // test hook: double-fire every accumulator update of partition 0 in
      // the barrier-riding passes, emulating a re-executed task (speculation
      // / fetch-failure stage retry / evicted-cache rebuild) whose updates
      // were already merged — the footer reconciliation must absorb it
      chaosAccumulatorDoubleFire: Boolean = false,
      saltMinBatch: Long = 65536L,
      // 256 rows/partition below the broadcast threshold: the extraction
      // kernel runs in the corpus-probe stage, so corpus partitions ARE the
      // extraction parallelism — 4096 left a 2k-page bench corpus in ONE
      // cached partition and serialized the kernel (measured 0.5s/gen -> 0.15)
      corpusRowsPerPartition: Long = 256L,
      broadcastBatchMax: Long = 65536L,
      // trap-gate refresh cadence in generations (only jobs with
      // trapMaxUrls > 0 pay it). A refresh reads the per-bucket trap-count
      // sidecars (pre-aggregated at compaction — O(distinct templates))
      // and template-derives only the frontier tail, so its cost is
      // O(templates + tail), never O(total seen); 1 is fine even at
      // 10^10-frontier scale, raise it only to shave driver actions.
      trapRefreshEvery: Int = 1,
      // plan-audit hook (PlanAudit / PLANS.md): record each superstep
      // stage's `explain("formatted")` (first occurrence per stage key)
      // into `capturedPlans`. Analysis-only — never forces execution — and
      // off by default: production supersteps pay zero cost.
      capturePlans: Boolean = false)

  final case class SeqEntry(jobId: String, url: String, urlNorm: String, host: String,
      depth: Int, priority: Long, parentUrl: String, attempt: Int, seq: Long)

  final case class FetchedRow(jobId: String, url: String, urlNorm: String, host: String,
      depth: Int, priority: Long, parentUrl: String, attempt: Int, seq: Long,
      __phtml: Array[Byte])

  final case class ExtractedRow(jobId: String, seq: Long, url: String, urlNorm: String,
      host: String, depth: Int, attempt: Int, status: Int, success: Boolean,
      terminal: Boolean, title: String, markdown: String, text: String,
      htmlClean: String, rawHtml: String, links: Seq[String],
      metadata: Seq[graft.core.Extractor.MetaEntry],
      timestamp: String,        // ISO-8601 extraction time (DataExtractor.ts:223)
      cost: Long,               // A4: credits for this page (1 per success)
      generation: Int)

  final case class CandRow(jobId: String, seq: Long, parentUrl: String, depth: Int,
      idx: Int, childUrl: String)

  /** A frontier row as persisted: FrontierEntry + the `__fresh` flag
    * (true = first enqueue of this (jobId, urlNorm) — the seen-set marker). */
  final case class FrontierRowF(jobId: String, url: String, urlNorm: String, host: String,
      depth: Int, priority: Long, parentUrl: String, attempt: Int, __fresh: Boolean)
  object FrontierRowF {
    def of(e: FrontierEntry, fresh: Boolean): FrontierRowF =
      FrontierRowF(e.jobId, e.url, e.urlNorm, e.host, e.depth, e.priority, e.parentUrl, e.attempt, fresh)
  }

  /** Growable Long-array accumulator (fresh-key hashes riding a write). */
  final class LongsAcc extends org.apache.spark.util.AccumulatorV2[Long, Seq[Long]] {
    private val buf = scala.collection.mutable.ArrayBuffer[Long]()
    override def isZero: Boolean = buf.isEmpty
    override def copy(): LongsAcc = {
      val c = new LongsAcc; c.buf ++= buf; c
    }
    override def reset(): Unit = buf.clear()
    override def add(v: Long): Unit = buf += v
    override def merge(o: org.apache.spark.util.AccumulatorV2[Long, Seq[Long]]): Unit =
      buf ++= o.asInstanceOf[LongsAcc].buf
    override def value: Seq[Long] = buf.toSeq
  }

  /** Per-key Long counter accumulator (per-job counters folded into write
    * barriers — each counted stage must be consumed by exactly one action). */
  final class LongMapAcc extends org.apache.spark.util.AccumulatorV2[(String, Long), Map[String, Long]] {
    private val m = scala.collection.mutable.HashMap[String, Long]()
    override def isZero: Boolean = m.isEmpty
    override def copy(): LongMapAcc = {
      val c = new LongMapAcc
      m.foreach { case (k, v) => c.m(k) = v }
      c
    }
    override def reset(): Unit = m.clear()
    override def add(kv: (String, Long)): Unit =
      m(kv._1) = m.getOrElse(kv._1, 0L) + kv._2
    override def merge(o: org.apache.spark.util.AccumulatorV2[(String, Long), Map[String, Long]]): Unit =
      o.asInstanceOf[LongMapAcc].m.foreach { case (k, v) => m(k) = m.getOrElse(k, 0L) + v }
    override def value: Map[String, Long] = m.toMap
  }
}

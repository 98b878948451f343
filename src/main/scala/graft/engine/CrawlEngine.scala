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
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    pages.select(col(settings.pagesUrlColumn).as("__purl"), col(settings.pagesHtmlColumn).as("__phtml"))
      .repartition(nPart, col("__purl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Materialize the partitioned corpus cache up front (the analog of the
    * bucketed pages table already sitting in the warehouse). Benchmarks call
    * this before starting the throughput clock; correctness paths may ignore
    * it (first superstep pays the load lazily). */
  def prepare(): Unit = { pagesPrepared.count(): Unit }

  private val robotsRules: Map[String, Robots.RobotRules] =
    robotsBodies.map { case (h, b) => (h, Robots.parse(b)) }

  final case class Report(
      generations: Int,
      progress: Map[String, JobProgress],
      totalFetched: Long,
      wallMillis: Long)

  // ------------------------------------------------------------------ state
  private var generation: Int = 0
  private var progress: Map[String, JobProgress] = Map.empty
  private var seqOffsets: Map[String, Long] = Map.empty
  private var bloom: SeenBloom = _
  private var configs: Map[String, CrawlConfig] = Map.empty

  /** Start a fresh crawl for `jobs` over the pages corpus. */
  def run(jobs: Seq[CrawlConfig]): Report = {
    val t0 = System.currentTimeMillis()
    configs = jobs.map(c => c.jobId -> c).toMap
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
        if (robotsOk) Some(FrontierEntry(c.jobId, s, norm, h, 0, i.toLong, "", 0)) else None
      }
    }.distinct
    seedEntries.foreach(e => bloom.put(e.jobId + "-" + e.urlNorm))
    progress = progress.map { case (j, p) =>
      j -> p.copy(enqueued = seedEntries.count(_.jobId == j).toLong)
    }
    val seedDs = spark.createDataset(seedEntries)
    seedDs.write.mode("overwrite").parquet(ckpt.frontierPath(0))
    seedDs.select($"jobId", $"urlNorm").write.mode("overwrite").parquet(ckpt.seenPath(0))

    loop()
    Report(generation, progress, progress.values.map(_.done).sum, System.currentTimeMillis() - t0)
  }

  /** Resume from the last committed generation (kill-at-gen-k test). */
  def resume(jobs: Seq[CrawlConfig]): Report = {
    val t0 = System.currentTimeMillis()
    configs = jobs.map(c => c.jobId -> c).toMap
    val m = ckpt.lastCommitted.getOrElse(
      throw new IllegalStateException(s"no committed generation under $workDir"))
    progress = m.progress.map(p => p.jobId -> p).toMap
    seqOffsets = m.seqOffsets
    bloom = SeenBloom.deserialize(java.nio.file.Files.readAllBytes(ckpt.bloomPath(m.generation)))
    generation = m.generation + 1
    ckpt.truncateAfter(generation) // drop partial output of a crashed gen
    loop()
    Report(generation, progress, progress.values.map(_.done).sum, System.currentTimeMillis() - t0)
  }

  private def activeJobs: Seq[CrawlConfig] =
    configs.values.toSeq.filter(c => !progress(c.jobId).finalized).sortBy(_.jobId)

  private def loop(): Unit = {
    var gen = generation
    while (activeJobs.nonEmpty && gen < settings.maxGenerations) {
      val frontier = spark.read.parquet(ckpt.frontierPath(gen)).as[FrontierEntry]
      val madeProgress = superstep(gen, frontier)
      if (!madeProgress) {
        // nothing schedulable (e.g., zero politeness budget): finalize rest
        progress = progress.map { case (j, p) =>
          if (p.finalized) (j, p) else (j, p.copy(finalized = true, finalizeReason = "stalled"))
        }
      }
      gen += 1
      generation = gen
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

  private def superstep(gen: Int, frontier: Dataset[FrontierEntry]): Boolean = {
    val t0 = System.currentTimeMillis()
    val active = activeJobs
    val activeIds = active.map(_.jobId)
    val pend = frontier.filter($"jobId".isin(activeIds: _*))

    // ---------------------------------------------------------- scheduling
    val ordCols = Seq(col("depth"), col("priority"), col("urlNorm"))

    // politeness: top hostBudget per (job, host), two-phase to dodge hot-host
    // skew (SURVEY §2.8 C2). Phase 1 ranks within (job, host, salt) buckets;
    // phase 2 ranks the <= salt*budget survivors exactly.
    val budgets = active.map(c => c.jobId -> c.hostBudgetPerStep).toMap
    val needPoliteness = budgets.values.exists(_ != Int.MaxValue)
    val polite =
      if (!needPoliteness) pend.toDF()
      else {
        val budgetCol = element_at(
          typedLit(budgets.map { case (k, v) => k -> math.min(v.toLong, Int.MaxValue.toLong) }),
          $"jobId")
        val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
        val w1 = Window.partitionBy($"jobId", $"host", salt).orderBy(ordCols: _*)
        val w2 = Window.partitionBy($"jobId", $"host").orderBy(ordCols: _*)
        pend.toDF()
          .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= budgetCol).drop("__r1")
          .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= budgetCol).drop("__r2")
      }

    // limit: top remaining per job (P6/W1), same two-phase shape
    val remaining = active.map { c =>
      val p = progress(c.jobId)
      c.jobId -> (if (c.limit > 0) math.max(0L, c.limit.toLong - p.done) else Long.MaxValue)
    }.toMap
    val needLimit = remaining.values.exists(_ != Long.MaxValue)
    val batchDf =
      if (!needLimit) polite
      else {
        val remCol = element_at(typedLit(remaining), $"jobId")
        val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
        val w1 = Window.partitionBy($"jobId", salt).orderBy(ordCols: _*)
        val w2 = Window.partitionBy($"jobId").orderBy(ordCols: _*)
        polite
          .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= remCol).drop("__r1")
          .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= remCol).drop("__r2")
      }
    val batch = batchDf.as[FrontierEntry]

    // ------------------------------------------- seq assignment (canonical)
    // Distributed sort + zipWithIndex: deterministic under any parallelism,
    // no single-partition window.
    val sortedRdd = batch
      .orderBy($"jobId" :: ordCols.toList: _*)
      .as[FrontierEntry].rdd.zipWithIndex().cache()
    // one job over the cached sorted batch yields count + per-job first
    // index + per-partition lineage together (three driver round-trips
    // collapsed into one — fixed superstep latency is what bounds scaling
    // efficiency at small batch sizes)
    val partStats: Array[(Int, Long, Map[String, Long])] = phase(gen, "seq-assign") {
      sortedRdd.mapPartitionsWithIndex { case (pi, it) =>
        var n = 0L
        val firsts = scala.collection.mutable.Map[String, Long]()
        it.foreach { case (fe, i) =>
          n += 1
          if (!firsts.contains(fe.jobId)) firsts(fe.jobId) = i
          else if (i < firsts(fe.jobId)) firsts(fe.jobId) = i
        }
        Iterator.single((pi, n, firsts.toMap))
      }.collect()
    }
    val batchCount = partStats.map(_._2).sum
    if (batchCount == 0) { sortedRdd.unpersist(false); return false }
    val firstIdxPerJob: Map[String, Long] = partStats.iterator.flatMap(_._3)
      .toSeq.groupMapReduce(_._1)(_._2)(math.min)
    val lineage: Map[String, Long] = partStats.map(s => s._1.toString -> s._2).toMap
    val offsets = seqOffsets
    val offB = spark.sparkContext.broadcast(offsets)
    val firstB = spark.sparkContext.broadcast(firstIdxPerJob)
    val seqed: Dataset[CrawlEngine.SeqEntry] = spark.createDataset(
      sortedRdd.map { case (fe, i) =>
        CrawlEngine.SeqEntry(fe.jobId, fe.url, fe.urlNorm, fe.host, fe.depth,
          fe.priority, fe.parentUrl, fe.attempt,
          offB.value(fe.jobId) + (i - firstB.value(fe.jobId)))
      })

    // ------------------------------------------------------------ fetch J1
    // INNER join + small anti-join for misses instead of a LEFT join: a
    // left-outer shuffled-hash join may only build on the corpus side (2 GB
    // hash table rebuilt per generation, GC-bound); the inner join builds on
    // the frontier batch and streams the cached corpus, and the 404 set is
    // recovered by an anti-join between two batch-sized frames.
    // shuffle_hash hint pins the strategy (AQE would flip between broadcast
    // and SHJ near the threshold as batch sizes cross it, with high variance);
    // build side = the hinted (batch) side, probe = partition-local cache scan
    val hit = seqed.hint("shuffle_hash")
      .join(pagesPrepared, seqed("urlNorm") === pagesPrepared("__purl"), "inner")
      .drop("__purl")
    val miss = seqed.join(
        hit.select(col("jobId").as("__mj"), col("urlNorm").as("__mu")).hint("broadcast"),
        seqed("jobId") === col("__mj") && seqed("urlNorm") === col("__mu"), "left_anti")
      .withColumn("__phtml", lit(null).cast("binary"))
    val fetched = hit.unionByName(miss)

    // ------------------------------------------------------- extract kernel
    // One mapPartitions pass produces ALL formats + out-links; the links
    // column rides along in the results parquet so link expansion reads the
    // materialized output instead of recomputing the kernel.
    val cfgB = spark.sparkContext.broadcast(configs)
    val genV = gen
    val extracted = fetched.as[CrawlEngine.FetchedRow].mapPartitions { it =>
      val cfgs = cfgB.value
      it.map { r =>
        val cfg = cfgs(r.jobId)
        if (r.__phtml == null) {
          val terminal = r.attempt + 1 >= cfg.maxAttempts
          CrawlEngine.ExtractedRow(r.jobId, r.seq, r.url, r.urlNorm, r.host, r.depth,
            r.attempt, 404, success = false, terminal = terminal, "", "", "", "", Nil, genV)
        } else {
          val html = new String(r.__phtml, java.nio.charset.StandardCharsets.UTF_8)
          val ex = Extractor.extract(r.url, html, cfg.formats)
          CrawlEngine.ExtractedRow(r.jobId, r.seq, r.url, r.urlNorm, r.host, r.depth,
            r.attempt, 200, success = true, terminal = true,
            ex.title, ex.markdown.getOrElse(""), ex.text.getOrElse(""),
            ex.html.getOrElse(""), ex.links, genV)
        }
      }
    }
    phase(gen, "fetch-extract-write") { extracted.write.mode("overwrite").parquet(ckpt.resultsPath(gen)) }
    sortedRdd.unpersist(false)

    val res = spark.read.parquet(ckpt.resultsPath(gen))

    // --------------------------------------------------- accounting (A1-A3)
    val statRows = phase(gen, "account") { res.groupBy("jobId").agg(
      sum(when($"terminal", 1L).otherwise(0L)).as("doneD"),
      sum(when($"success", 1L).otherwise(0L)).as("succD"),
      sum(when($"terminal" && !$"success", 1L).otherwise(0L)).as("failD"),
      count(lit(1)).as("fetchedD")
    ).collect() }
    statRows.foreach { row =>
      val j = row.getString(0)
      val p = progress(j)
      progress += j -> p.copy(
        done = p.done + row.getLong(1),
        succeeded = p.succeeded + row.getLong(2),
        failed = p.failed + row.getLong(3))
      seqOffsets += j -> (seqOffsets(j) + row.getLong(4))
    }

    // ------------------------------------------------- link expansion P2-P5
    val enqueuedSoFar = progress.map { case (j, p) => j -> p.enqueued }
    val enqB = spark.sparkContext.broadcast(enqueuedSoFar)
    val robotsB = spark.sparkContext.broadcast(robotsRules)
    val candRaw = res
      .filter($"success" && $"terminal")
      .select($"jobId", $"seq", $"url".as("parentUrl"), $"depth",
        posexplode($"links").as(Seq("idx", "childUrl")))
      .as[CrawlEngine.CandRow]
      .mapPartitions { it =>
        val cfgs = cfgB.value
        val robots = robotsB.value
        val enqueued = enqB.value
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
              else Some(FrontierEntry(c.jobId, c.childUrl, UrlOps.normalize(c.childUrl), h,
                nd, c.seq * 4096L + math.min(c.idx, 4095L), c.parentUrl, 0))
            }
          }
        }
      }

    // in-batch dedup: canonical-min entry per (jobId, urlNorm) (U1)
    val cand = candRaw
      .groupByKey(e => (e.jobId, e.urlNorm))
      .reduceGroups { (a, b) =>
        val ord = Ordering.Tuple4[Int, Long, String, String]
        if (ord.lteq((a.depth, a.priority, a.parentUrl, a.url), (b.depth, b.priority, b.parentUrl, b.url))) a else b
      }
      .map(_._2)

    // ----------------------------------- seen-set dedup: bloom + exact (J2)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf { (jobId: String, urlNorm: String) =>
      bloomB.value.mightContain(jobId + "-" + urlNorm)
    }
    val tagged = cand.withColumn("__maybe", mightContain($"jobId", $"urlNorm"))
    val definitelyNew = tagged.filter(!$"__maybe").drop("__maybe").as[FrontierEntry]
    val positives = tagged.filter($"__maybe").drop("__maybe").as[FrontierEntry]
    val seenPaths = ckpt.seenPathsThrough(gen)
    val survivors =
      if (seenPaths.isEmpty) positives
      else {
        val seenDf = spark.read.parquet(seenPaths: _*)
        positives.join(seenDf, Seq("jobId", "urlNorm"), "left_anti").as[FrontierEntry]
      }
    var fresh = definitelyNew.unionByName(survivors)

    // enqueue-cap: never let a job's total enqueued exceed its limit
    // (Base.ts:312-325 / enqueueLinks limit). Canonical-first wins.
    val capNeeded = active.exists(c => c.limit > 0)
    if (capNeeded) {
      val capMap = active.map { c =>
        val room = if (c.limit > 0) math.max(0L, c.limit.toLong - progress(c.jobId).enqueued) else Long.MaxValue
        c.jobId -> room
      }.toMap
      val capCol = element_at(typedLit(capMap), $"jobId")
      val salt = pmod(xxhash64($"urlNorm"), lit(settings.saltBuckets))
      val w1 = Window.partitionBy($"jobId", salt).orderBy(ordCols: _*)
      val w2 = Window.partitionBy($"jobId").orderBy(ordCols: _*)
      fresh = fresh.toDF()
        .withColumn("__r1", row_number().over(w1)).filter($"__r1" <= capCol).drop("__r1")
        .withColumn("__r2", row_number().over(w2)).filter($"__r2" <= capCol).drop("__r2")
        .as[FrontierEntry]
    }

    // ------------------------------------------------------ commit the step
    phase(gen, "expand-dedup-write") { fresh.select($"jobId", $"urlNorm").write.mode("overwrite").parquet(ckpt.seenPath(gen + 1)) }
    val freshRead = spark.read.parquet(ckpt.seenPath(gen + 1))
    // single pass: per-job fresh counts + the generation's bloom together
    val freshCounts = phase(gen, "bloom-build") {
      val (newBloom, counts) = SeenBloom.fromJobKeys(freshRead, "jobId", "urlNorm",
        settings.bloomShards, settings.bloomExpectedPerShard, settings.bloomFpp)
      bloom.mergeFrom(newBloom)
      counts
    }
    freshCounts.foreach { case (j, n) =>
      progress += j -> progress(j).copy(enqueued = progress(j).enqueued + n)
    }

    // next frontier = (pending - batch) ∪ retries ∪ fresh.
    // Retries keep their original frontier row (priority unchanged, so the
    // canonical order is preserved) with attempt+1 — recovered by joining
    // the non-terminal result keys back against the pending set.
    val batchKeys = res.select($"jobId", $"urlNorm")
    val deferred = pend.join(batchKeys, Seq("jobId", "urlNorm"), "left_anti").as[FrontierEntry]
    val retriesWithPrio = pend.toDF().join(
        res.filter(!$"terminal").select($"jobId", $"urlNorm", ($"attempt" + 1).as("__nextAttempt")),
        Seq("jobId", "urlNorm"), "inner")
      .withColumn("attempt", $"__nextAttempt").drop("__nextAttempt")
      .select($"jobId", $"url", $"urlNorm", $"host", $"depth", $"priority", $"parentUrl", $"attempt")
      .as[FrontierEntry]

    val nextFrontier = deferred.unionByName(retriesWithPrio).unionByName(fresh)
    phase(gen, "frontier-write") { nextFrontier.write.mode("overwrite").parquet(ckpt.frontierPath(gen + 1)) }

    // pending counts for finalize decision
    val pendCounts = spark.read.parquet(ckpt.frontierPath(gen + 1))
      .groupBy("jobId").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    progress = progress.map { case (j, p) =>
      if (p.finalized) (j, p)
      else {
        val cfg = configs(j)
        val (fin, reason) = p.shouldFinalize(cfg.limit, pendCounts.getOrElse(j, 0L))
        (j, if (fin) p.copy(finalized = true, finalizeReason = reason) else p)
      }
    }

    ckpt.commit(GenManifest(
      generation = gen,
      progress = progress.values.toSeq.sortBy(_.jobId),
      seqOffsets = seqOffsets,
      batchCount = batchCount,
      freshCount = freshCounts.values.sum,
      partitionLineage = lineage,
      fetchedPages = batchCount,
      extractedDocs = statRows.map(_.getLong(2)).sum,
      wallMillis = System.currentTimeMillis() - t0), bloom.serialized)

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

  /** The final URL-seen set (jobId, urlNorm). */
  def seenSet(): DataFrame = {
    val last = ckpt.lastCommitted.map(_.generation).getOrElse(-1)
    val paths = ckpt.seenPathsThrough(last + 1)
    if (paths.isEmpty) spark.emptyDataFrame else spark.read.parquet(paths: _*).distinct()
  }
}

object CrawlEngine {
  final case class Settings(
      pagesUrlColumn: String = "url",
      pagesHtmlColumn: String = "html",
      bloomShards: Int = 4,
      bloomExpectedPerShard: Long = 1000000L,
      bloomFpp: Double = 0.01,
      saltBuckets: Int = 32,
      maxGenerations: Int = 1000)

  final case class SeqEntry(jobId: String, url: String, urlNorm: String, host: String,
      depth: Int, priority: Long, parentUrl: String, attempt: Int, seq: Long)

  final case class FetchedRow(jobId: String, url: String, urlNorm: String, host: String,
      depth: Int, priority: Long, parentUrl: String, attempt: Int, seq: Long,
      __phtml: Array[Byte])

  final case class ExtractedRow(jobId: String, seq: Long, url: String, urlNorm: String,
      host: String, depth: Int, attempt: Int, status: Int, success: Boolean,
      terminal: Boolean, title: String, markdown: String, text: String,
      htmlClean: String, links: Seq[String], generation: Int)

  final case class CandRow(jobId: String, seq: Long, parentUrl: String, depth: Int,
      idx: Int, childUrl: String)
}

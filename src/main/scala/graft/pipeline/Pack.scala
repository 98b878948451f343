package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-shard assembly: assign every document a token-budget shard in a
 * deterministic global order (the layout step that turns a curated corpus
 * into fixed-size training shards). The rule is the scalable greedy
 * degenerate of bin packing: `shard = floor(prefix_tokens_before /
 * budget)` over the total (idCol) order — a document that straddles a
 * boundary belongs to the shard it STARTS in.
 *
 * The global prefix sum is NOT a single-partition window: the naive
 * `sum().over(Window.orderBy(...))` plans one unpartitioned window task
 * and collapses a 100 TB corpus onto a single executor. Instead:
 * range-repartition by the order key, materialize that partitioning ONCE
 * (checkpoint — the two passes must observe identical sampled range
 * boundaries), take per-partition token sums in one kernel pass (P longs
 * to the driver), broadcast the exclusive partition offsets back, and
 * emit each row's offset in a second pass. Output values are invariant to
 * where the sampled boundaries fall because the order is total — only
 * which partition computes a row changes, never its global prefix.
 */
object Pack {

  private def requireIntegral(df: DataFrame, c: String): Unit =
    Contracts.requireIntegral(df, c, "Pack.shardByBudget")

  /** (idCol, tokens, offset_tokens, shard) for every input row; `budget`
    * in tokens. `partitions` defaults to the session shuffle parallelism.
    *
    * Contract: `idCol`/`tokenCol` must be integral (checked against the
    * schema — no silent lossy cast); ids must be non-null (a null id has
    * no place in a total order and fails the row decode); null token
    * counts read as 0 (matching SQL SUM-ignores-NULL semantics). Both
    * kernel passes index the partition-offset array by the CHECKPOINTED
    * RDD's own partition index (`mapPartitionsWithIndex`), never
    * `TaskContext.getPartitionId` — a downstream `coalesce` pipelines
    * multiple parent partitions into one task, where the task id would
    * silently corrupt every offset. Lifecycle: with no checkpoint dir the
    * materialized base frame's blocks are reference-tracked and freed on
    * GC; with a reliable checkpoint dir configured the caller owns the
    * dir's lifecycle (same contract as the Graph rounds' final frame). */
  def shardByBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    requireIntegral(df, idCol)
    requireIntegral(df, tokenCol)
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = Checkpoints.step(
        df.select(col(idCol).cast("long"),
            coalesce(col(tokenCol).cast("long"), lit(0L)))
          .repartitionByRange(parts, col(idCol))
          .sortWithinPartitions(idCol))
      .as[(Long, Long)]
    val sums = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach { case (_, t) => s += t }
      Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val ob = spark.sparkContext.broadcast(offsets)
    val packed = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = ob.value(pid)
      it.map { case (id, t) =>
        val off = run
        run += t
        (id, t, off, off / budget)
      }
    }
    spark.createDataFrame(packed)
      .toDF(idCol, "tokens", "offset_tokens", "shard")
  }

  /** Exact 0-based GLOBAL RANK of every row over the total order given by
    * `orderCols` (the tuple must be duplicate-free or ranks are
    * nondeterministic between equal rows) — same windowless machinery as
    * [[shardByBudget]] with unit weights: range-repartition on the order
    * key, materialize once, per-partition row counts (P longs to the
    * driver), broadcast exclusive offsets, emit offset+position in a
    * second kernel pass. Never a single-partition window; rank values are
    * invariant to where the sampled range boundaries fall.
    *
    * This is the scale-safe spine of any exact quantile/NTILE-style split
    * (CCNet's head/middle/tail perplexity buckets, q76): bucket =
    * `rank * k div N` needs only this rank and the total count. */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      rankCol: String = "rank", partitions: Int = 0,
      totalCol: Option[String] = None): DataFrame = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = Checkpoints.step(
      df.repartitionByRange(parts, orderCols.map(col): _*)
        .sortWithinPartitions(orderCols.map(col): _*))
    val counts = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val ob = spark.sparkContext.broadcast(offsets)
    // offsets.last IS the total row count — callers that need N for a
    // quantile rule get it as a literal column instead of a second scan
    val withTotal = (d: DataFrame) =>
      totalCol.fold(d)(c => d.withColumn(c, lit(offsets.last)))
    val outSchema = base.schema.add(rankCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    // same indexing contract as shardByBudget: the CHECKPOINTED rdd's own
    // partition index, never TaskContext.getPartitionId
    val ranked = base.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = ob.value(pid)
      it.map { row =>
        val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ run)
        run += 1
        r
      }
    }
    withTotal(spark.createDataFrame(ranked, outSchema))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental-recrawl delta between two crawl snapshots (the Common-Crawl
 * monthly-snapshot shape): classify every URL as new / changed / unchanged
 * / gone by comparing content hashes, and emit an adaptive revisit
 * interval (halve on change, double on no-change — the classic
 * Cho & Garcia-Molina adaptive recrawl policy, "Effective Page Refresh
 * Policies for Web Crawlers", ACM TODS 2003).
 *
 * Spark shape at the 10^10-URL frontier:
 *  - ONE full-outer equi-join on the URL key, carrying only (url, hash,
 *    ts, interval) — content hashes are projected at the scan, so page
 *    bytes never shuffle (`ReadSchema` stays 3-4 narrow columns).
 *  - With both snapshots bucketed by url (the at-rest layout the engine's
 *    checkpoints already use for the frontier), the join is co-located —
 *    zero exchange; unbucketed inputs pay the one canonical hash
 *    exchange per side. Skew is impossible on a unique key.
 *  - The classification + interval policy is a pure `when` chain — whole
 *    stage codegen, no UDF.
 *
 * Reference scope: AnyCrawl crawls job-scoped trees and has no snapshot
 * diffing; this extends the crawl layer the way SURVEY §2.11 extends the
 * pipeline layer (revisit scheduling is what turns a one-shot crawler
 * into a continuously-fresh corpus).
 */
object Recrawl {

  val MinIntervalSecs: Long = 3600L        // 1 h floor
  val MaxIntervalSecs: Long = 30L * 86400L // 30 d ceiling
  val DefaultIntervalSecs: Long = 86400L   // first sighting: 1 d

  /**
   * Delta of `curr` over `prev`. Both frames need (urlCol, hashCol, tsCol);
   * `prev` may also carry `intervalCol` (seconds) from the previous delta —
   * absent, every URL starts at [[DefaultIntervalSecs]].
   *
   * Returns (url, status, prev_ts, curr_ts, next_interval_secs) where
   * status ∈ {new, changed, unchanged, gone}:
   *  - new:       only in curr → default interval
   *  - changed:   hash differs → interval halves (clamped to the floor)
   *  - unchanged: hash equal   → interval doubles (clamped to the ceiling)
   *  - gone:      only in prev → interval unchanged (retry-later signal;
   *               dropping tombstones is the caller's policy)
   */
  def delta(prev: DataFrame, curr: DataFrame, urlCol: String,
      hashCol: String, tsCol: String,
      intervalCol: Option[String] = None): DataFrame = {
    val prevInterval: Column = intervalCol
      .map(c => coalesce(col("p." + c), lit(DefaultIntervalSecs)))
      .getOrElse(lit(DefaultIntervalSecs))
    // presence markers, NOT key nullity: a (corrupt) null-url row never
    // matches the join key, and its side's marker is what says which
    // snapshot it came from
    val p = prev.withColumn("__in_prev", lit(true)).alias("p")
    val c = curr.withColumn("__in_curr", lit(true)).alias("c")
    val joined = p.join(c, col("p." + urlCol) === col("c." + urlCol), "full_outer")
    val isNew = col("p.__in_prev").isNull
    val isGone = col("c.__in_curr").isNull
    // null-safe compare: hash null on BOTH sides reads "unchanged" (no
    // evidence of change -> back off), null vs value reads "changed"; a
    // plain === would drive every null-hash URL to the floor interval
    val same = col("p." + hashCol) <=> col("c." + hashCol)
    val status = when(isNew, lit("new"))
      .when(isGone, lit("gone"))
      .when(same, lit("unchanged"))
      .otherwise(lit("changed"))
    val nextInterval = when(isNew, lit(DefaultIntervalSecs))
      .when(isGone, prevInterval)
      .when(same, least(prevInterval * 2, lit(MaxIntervalSecs)))
      .otherwise(greatest(prevInterval / 2, lit(MinIntervalSecs)))
    joined.select(
      coalesce(col("p." + urlCol), col("c." + urlCol)).as(urlCol),
      status.as("status"),
      col("p." + tsCol).as("prev_ts"),
      col("c." + tsCol).as("curr_ts"),
      nextInterval.cast("long").as("next_interval_secs"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-mixture planning — the step every pretraining run performs between
 * curation and shard packing: given per-source token availability and a
 * target mixture (integer weight per source, DoReMi/“data mixing” style),
 * compute the largest total token budget whose mixture is FEASIBLE without
 * up-sampling, and each source's take / sampling rate / surplus against it.
 *
 *   W  = sum of weights over sources present
 *   N* = min over sources of floor(T_s * W / w_s)   (feasible mixture total)
 *   take_s = floor(N* * w_s / W)                    (never exceeds T_s)
 *
 * All arithmetic is exact integer math — the plan is byte-identical on any
 * partitioning, and a SQL oracle replays it with `//` division.
 *
 * Shape for 100 TB: the only distributed work is the per-source token SUM
 * (one exchange whose output is #sources rows — a dimension, not data).
 * The plan itself is driver math over that dimension, using
 * `Math.multiplyExact` so silent Long overflow is impossible (T_s * W at
 * 10^14 tokens x weight sums ~10^3 is within Long range; anything beyond
 * fails loudly rather than wrongly). Sources with weight <= 0 or absent
 * from the weight map are excluded from both W and the output.
 */
object Mixture {

  /** Plan rows: (source, tokens_avail, weight, take_tokens, rate_milli,
    * surplus), ordered by source. `tokens` is the per-row token count
    * expression (e.g. TextAnalysis.tokenCountWs). */
  def plan(docs: DataFrame, sourceCol: String, tokens: Column,
           weights: Map[String, Long], maxSources: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val totals = docs
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(tokens.cast("long")).as("tokens_avail"))
      .as[(String, Long)]
      .collect()
    require(totals.length <= maxSources,
      s"${totals.length} sources exceed maxSources=$maxSources — not a dimension")
    val present = totals.toMap
    val active = weights.toSeq
      .filter { case (s, w) => w > 0 && present.contains(s) }
      .sortBy(_._1)
    val w = active.map(_._2).sum
    val nStar =
      if (active.isEmpty) 0L
      else active.map { case (s, ws) =>
        Math.floorDiv(Math.multiplyExact(present(s), w), ws)
      }.min
    val rows = active.map { case (s, ws) =>
      val avail = present(s)
      val take = Math.floorDiv(Math.multiplyExact(nStar, ws), w)
      val rate =
        if (avail > 0) Math.floorDiv(Math.multiplyExact(take, 1000L), avail)
        else 0L
      (s, avail, ws, take, rate, avail - take)
    }
    spark.createDataset(rows)
      .toDF("source", "tokens_avail", "weight", "take_tokens", "rate_milli",
        "surplus")
      .orderBy(col("source"))
  }
}

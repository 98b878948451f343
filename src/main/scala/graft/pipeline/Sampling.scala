package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic stratified sampling / data mixing for training-data
 * pipelines: keep a row iff `hash(row) mod D < rate(stratum) * D`, with the
 * per-stratum rates inlined as a literal CASE chain.
 *
 * Scale shape: one codegen'd filter over the scan — no shuffle, no RNG
 * state, and (unlike `df.sample`) exactly reproducible across runs, task
 * retries, AND cluster sizes, because membership depends only on the row's
 * id, never on partitioning. That retry-stability is the property that
 * matters at 100 TB: a re-executed task re-selects the identical subset, so
 * downstream counts can be reconciled instead of drifting.
 *
 * The hash column is injectable: production uses `xxhash64(salt, id)`
 * (uniform, key-spread); tests and SQL oracles can pass any deterministic
 * expression (e.g. `pmod(id, D)`) since the selection rule is unchanged.
 */
object Sampling {

  val Denominator = 10000L

  /** Default production hash: xxhash64 of (salt, id), folded to [0, D). */
  def defaultHash(idCol: Column, salt: Long): Column =
    pmod(xxhash64(lit(salt), idCol), lit(Denominator))

  /** Per-stratum threshold column from a literal rate map (rows in strata
    * missing from `rates` get `defaultRate`). */
  def thresholdCol(stratumCol: Column, rates: Map[String, Double],
      defaultRate: Double): Column = {
    val default = lit((defaultRate * Denominator).toLong)
    rates.toSeq.sortBy(_._1).foldLeft(default) { case (acc, (k, r)) =>
      when(stratumCol === k, lit((r * Denominator).toLong)).otherwise(acc)
    }
  }

  /** Filter `df` down to the deterministic per-stratum sample. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      rates: Map[String, Double], hashCol: Column,
      defaultRate: Double = 0.0): DataFrame =
    df.filter(hashCol < thresholdCol(col(stratumCol), rates, defaultRate))

  /** Convenience: production sampler keyed on xxhash64(salt, idCol). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], salt: Long): DataFrame =
    stratifiedSample(df, stratumCol, rates, defaultHash(col(idCol), salt))
}

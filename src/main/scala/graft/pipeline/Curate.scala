package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The composed training-data curation pipeline: exact dedup → repetition
 * rules → quality floor → stratified sampling, with per-document
 * attribution of the FIRST stage that dropped it (`stage` column:
 * dup | repetition | quality | sample | kept).
 *
 * Scale shape: ONE exchange total — the min-id-per-content-hash window for
 * dedup. Every other stage (Gopher repetition, quality score, sampling
 * hash) is a codegen'd Column expression evaluated in the same pass, so
 * at 100 TB the whole curation decision costs a single hash-partitioned
 * shuffle of (hash, id) pairs plus one streaming projection. Stage order
 * is fixed (cheap global rule first, per-doc rules after) and attribution
 * is first-match, so attrition stats per stage are well-defined.
 */
object Curate {

  def curate(docs: DataFrame, textCol: String, idCol: String,
      stratumCol: String, rates: Map[String, Double], qualityMin: Double,
      hashCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(lower(col(textCol))))
    docs
      .withColumn("__keep_id", min(col(idCol)).over(w))
      .withColumn("stage",
        when(col(idCol) =!= col("__keep_id"), "dup")
          .when(!TextAnalysis.gopherKeep(col(textCol)), "repetition")
          .when(TextAnalysis.qualityScore(col(textCol)) < qualityMin, "quality")
          .when(hashCol >= Sampling.thresholdCol(col(stratumCol), rates, 0.0), "sample")
          .otherwise("kept"))
      .select(col(idCol), col(stratumCol), col("stage"))
  }

  /** Attrition summary: docs per (stage), the monitoring view a pipeline
    * operator actually watches. */
  def attrition(curated: DataFrame): DataFrame =
    curated.groupBy("stage").agg(count(lit(1)).as("docs")).orderBy("stage")
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training-data pipelines: flag corpus
 * documents that overlap an evaluation set by at least `minHits` distinct
 * word n-grams (the GPT-3/Llama-style 13-gram rule).
 *
 * Scale shape: the benchmark side is tiny versus the corpus (a full eval
 * suite is ~10^5 shingles), so its distinct shingle hashes become the BUILD
 * side of a broadcast join; the 100 TB corpus streams map-side — shingle,
 * hash, probe, partial-count — and only (doc, hits>0) survivors reach the
 * one aggregate exchange. No shuffle of corpus text, ever; the doc side is
 * a single projection inside whole-stage codegen (split/slice/xxhash64
 * Column expressions, no UDF).
 */
object Decontaminate {

  /** Distinct xxhash64 hashes of all `n`-word shingles of `textCol`,
    * lowercased, whitespace-tokenized — as a per-row array column. */
  def shingleHashes(textCol: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val words = filter(split(lower(textCol), "\\s+"), w => length(w) > 0)
    // i-th shingle = words[i .. i+n-1], 0-based; none if fewer than n words
    // (sequence() rejects stop < start, so short docs need the guard)
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n, lit(1)),
        i => xxhash64(concat_ws(" ", slice(words, i + 1, lit(n)))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /**
   * Returns (idCol, hits, contaminated) for every document: `hits` =
   * number of DISTINCT benchmark shingles present in the doc,
   * `contaminated` = hits >= minHits.
   */
  def flag(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 13, minHits: Int = 2): DataFrame = {
    val benchHashes = bench
      .select(explode(shingleHashes(col(benchTextCol), n)).as("__h"))
      .distinct()
    val docShingles = docs
      .select(col(idCol), explode_outer(shingleHashes(col(textCol), n)).as("__h"))
    // LEFT join against the broadcast bench table so hit-less docs keep a
    // row (hits=0); the aggregate is partial (map-side combine) on idCol
    val hits = docShingles
      .join(broadcast(benchHashes.withColumn("__hit", lit(1))), Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum("__hit"), lit(0)).cast("long").as("hits"))
    hits.withColumn("contaminated", col("hits") >= minHits)
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary building — the statistics a BPE/unigram tokenizer
 * trainer (or a DSIR-style featurizer choosing its hash width) consumes:
 * per-token term frequency (tf) and document frequency (df), top-K by tf.
 *
 * Shape for 100 TB: the naive explode → groupBy ships one row per token
 * OCCURRENCE into the exchange (corpus-sized shuffle) and an exact
 * `count(DISTINCT doc_id)` per token on top. Instead each document is
 * collapsed in ONE kernel pass to its distinct (token, in-doc count, 1)
 * triples — per-doc dedup costs a small hash map in the task, never a
 * (doc_id, token) exchange — and the single token-keyed shuffle carries
 * already-combined partials that the map-side partial aggregate combines
 * again per partition. df is then a plain SUM, exact, with no distinct
 * machinery. Top-K is `TakeOrderedAndProject` (per-partition heaps), never
 * a global sort.
 *
 * Tokenization matches q13's `tokenCountWs` (ASCII-whitespace split, empty
 * tokens dropped) plus Spark-semantics lowercasing (UTF8String.toLowerCase
 * — byte-identical to the `lower()` Column, so SQL oracles replay it).
 */
object Vocab {

  /** Distinct (token, in-doc count) pairs of one document. */
  def docTokenCounts(text: String): Iterator[(String, Long)] = {
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val m = new java.util.HashMap[String, Long]()
    for (t <- lowered.split("\\s+") if t.nonEmpty)
      m.merge(t, 1L, (a, b) => a + b)
    import scala.jdk.CollectionConverters._
    m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
  }

  /** (token, tf, df) for the top-`k` vocabulary by tf, ties broken by
    * token ascending (a total order — deterministic at any parallelism).
    * Null texts contribute nothing. */
  def topK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Iterator.empty else docTokenCounts(t))
      .toDF("token", "cnt")
      .groupBy(col("token"))
      .agg(sum(col("cnt")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.functions._

/**
 * Exact repeated-passage deduplication — the span-level exact dedup of
 * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
 * Better", ExactSubstr): find token windows of length `window` that occur
 * more than once across the corpus and keep only the globally-first
 * occurrence. Complements the document-level families already here (exact
 * q11, MinHash q18, SimHash q19, semantic q46, boilerplate-line q51):
 * repeated PASSAGES — licenses, navigation blurbs, quoted chunks — hide
 * inside otherwise-unique documents, and none of those operators see them.
 *
 * The paper builds a corpus-wide suffix array, which is inherently
 * sequential; the Spark-native shape is stride-`stride` fixed-length
 * windows fingerprinted in ONE kernel scan:
 *
 *   occ(doc_id, pos, key, rank)    rank = doc_id * PosLimit + pos
 *
 * reliably checkpointed (narrow rows — the corpus TEXT never shuffles and
 * is scanned exactly once), then
 *
 *   stats = occ.groupBy(key).agg(copies = count(*), min_rank = min(rank))
 *           .filter(copies >= 2)
 *
 * count/min are map-side combinable, so a 10^9-copy boilerplate window
 * arrives at its reducer as per-task partials — never raw occurrences; the
 * skew a per-key row_number window would concentrate on one task simply
 * does not exist in this plan. The verdict join (occ ⋈ stats on key) is
 * over the checkpointed narrow rows; AQE broadcasts the shared-key table
 * when small and skew-splits the shuffle join otherwise.
 *
 *   keep = rank == min_rank   — "first" is the TOTAL order (doc_id, pos),
 *   so the survivor set is identical at any parallelism and on any task
 *   retry (the q40/Sampling retry-stability property).
 *
 * stride == window fingerprints every token once and is the at-scale
 * config: any duplicated span of length >= 2*window - 1 contains a fully
 * aligned window on both sides and is caught. stride < window (down to 1,
 * the exact-recall setting used by the q62 oracle) raises recall on spans
 * in [window, 2*window-1) at proportional fingerprint cost.
 *
 * The window key is injectable ([[Sampling]]'s pattern): production passes
 * [[xxh64Key]] — Spark SQL's own xxhash64 (seed 42) over the joined window,
 * an 8-byte shuffle row; oracles pass [[rawKey]] — the joined window string
 * itself — so DuckDB replays the grouping with zero hash machinery. A
 * U+001F inside a token could make two different windows join equal; both
 * keyers share the join, so Spark and the oracle merge them identically
 * (and xxh64's own 2^-64 collision band already dwarfs that corner).
 */
object PassageDedup {

  /** pos must stay below this so rank = doc_id * PosLimit + pos is a total
    * order packed in one long: docs up to 2^21 tokens, ids up to 2^42. */
  val PosLimit: Long = 1L << 21

  /** q13/q54 whitespace tokenizer contract (see [[LmScore.tokens]]). */
  def tokens(text: String): Array[String] = LmScore.tokens(text)

  /** Window tokens joined by U+001F (unit separator). */
  private def joinWindow(ts: Array[String], from: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder
    var i = from
    while (i < from + n) {
      if (i > from) sb.append(31.toChar)
      sb.append(ts(i))
      i += 1
    }
    sb.toString
  }

  /** Oracle keyer: the joined window itself (SQL-replayable, collision-free). */
  def rawKey(window: String): String = window

  /** Production keyer: Spark SQL's xxhash64 (seed 42) of the joined window —
    * byte-identical to the `xxhash64()` Column over the same string. */
  def xxh64Key(window: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(window),
      org.apache.spark.sql.types.StringType, 42L)

  /** Occurrence verdicts for every window that appears >= 2 times in the
    * corpus: (doc_id, pos, copies, keep) with keep true only on the
    * globally-first occurrence. Null text yields no windows; a null (or
    * non-long-castable) id fails loudly — a silently dropped document would
    * corrupt the survivor set. `sorted` (default true) orders by
    * (doc_id, pos) for oracle determinism; production at scale passes
    * false and skips the range exchange. */
  def verdicts[K](docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, keyOf: String => K,
      sorted: Boolean = true)
      (implicit enc: Encoder[(Long, Long, K)]): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0, "stride must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val occRaw = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(java.lang.Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          if (id == null) throw new IllegalArgumentException(
            "PassageDedup: null or non-long-castable doc id — every " +
              "document must carry a long id")
          val ts = if (text == null) Array.empty[String] else tokens(text)
          val n = ts.length - window + 1
          if (n <= 0) Iterator.empty
          else {
            if (n > PosLimit) throw new IllegalArgumentException(
              s"PassageDedup: doc $id has ${ts.length} tokens; " +
                s"positions must stay below PosLimit=$PosLimit")
            if (id < 0 || id >= Long.MaxValue / PosLimit)
              throw new IllegalArgumentException(
                s"PassageDedup: doc id $id outside [0, 2^42) rank range")
            Iterator.range(0, n, stride).map { p =>
              (id.longValue, p.toLong, keyOf(joinWindow(ts, p, window)))
            }
          }
        }
      }(enc)
      .toDF("doc_id", "pos", "key")
      .withColumn("rank", col("doc_id") * lit(PosLimit) + col("pos"))
    // one corpus-text scan total: stats and the verdict join both read the
    // checkpointed narrow occurrence rows, never the text again
    val occ = Checkpoints.step(occRaw)
    val stats = occ.groupBy(col("key"))
      .agg(count(lit(1)).as("copies"), min(col("rank")).as("min_rank"))
      .filter(col("copies") >= 2)
    val out = occ.join(stats, "key")
      .select(col("doc_id"), col("pos"), col("copies"),
        (col("rank") === col("min_rank")).as("keep"))
    if (sorted) out.orderBy(col("doc_id"), col("pos")) else out
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Inverted-index construction over the crawled corpus — the search-side
 * product of a crawl+search deployment (the reference serves SERPs from an
 * engine built over exactly this structure; building it from our own crawl
 * output closes the crawl→index→search loop). Per term: document frequency,
 * total term frequency, and a capped posting list of the lowest doc ids.
 *
 * Shape for 100 TB: one kernel pass per document collapses the text to its
 * distinct (token, in-doc count) pairs — the only exchange is token-keyed
 * and carries one row per distinct (doc, token), i.e. the index's own size,
 * never one row per token occurrence. df/tf are plain count/sum on those
 * partials. The posting list is the scale hazard: `collect_list` + slice
 * would buffer EVERY doc id of a stopword ("the" at 10^10 docs) in one
 * aggregation buffer before capping. [[Index.BottomKLongs]] instead keeps a
 * bounded sorted buffer of at most `cap` ids through both the partial and
 * final aggregation, so no buffer anywhere exceeds `cap` longs regardless
 * of term skew. Full (uncapped) postings at scale are a different layout —
 * parquet term-bucketed by `hash(token) % B`, appended per crawl generation
 * — this operator is the dictionary + head-postings build.
 *
 * Tokenization is q13/q54's contract: ASCII-whitespace split, empties
 * dropped, UTF8String lowercasing (byte-identical to the `lower()` Column,
 * so SQL oracles replay it). Reference behavior anchor: search results are
 * keyed by (term → ranked docs) in packages/search; this is the batch-built
 * equivalent of that lookup table.
 */
object Index {

  /** Order-insensitive bottom-K over longs: a sorted ascending buffer of at
    * most `k` elements; merge keeps the k smallest of the union. Exactly
    * reproducible on any partitioning (min-K of a multiset is
    * order-independent; ids are unique per (token, doc)). */
  final class BottomKLongs(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, "k must be positive")

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], a: Long): Array[Long] = {
      if (buf.length == k && a >= buf(k - 1)) buf
      else {
        var lo = 0; var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(mid) < a) lo = mid + 1 else hi = mid
        }
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, lo)
        if (lo < n) {
          out(lo) = a
          System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
        }
        out
      }
    }

    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        val n = math.min(b1.length + b2.length, k)
        val out = new Array[Long](n)
        var i = 0; var j = 0; var o = 0
        while (o < n) {
          if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) {
            out(o) = b1(i); i += 1
          } else { out(o) = b2(j); j += 1 }
          o += 1
        }
        out
      }
    }

    def finish(r: Array[Long]): Array[Long] = r

    def bufferEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: ExpressionEncoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Dictionary + head postings: per token, exact `doc_freq`/`tf` and the
    * `cap` lowest doc ids joined as a comma string (deterministic, and the
    * form a SQL oracle can recompute). Terms with `doc_freq < minDf` are
    * dropped (hapax pruning — the standard dictionary-size control).
    *
    * PRECONDITION: `idCol` is the documents table's primary key — ONE row
    * per document. Duplicate id rows are not detected (detecting them would
    * cost a second (token,id)-keyed exchange of the full index) and would
    * count once per row in `doc_freq` and repeat in `postings`. Rows with a
    * null id or null text contribute nothing. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               minDf: Int = 1, cap: Int = 16): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val bottomK = udaf(new BottomKLongs(cap))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(java.lang.Long, String)]
      .flatMap { case (id, t) =>
        if (id == null || t == null) Iterator.empty
        else {
          val i = id.longValue
          Vocab.docTokenCounts(t).map { case (tok, c) => (tok, i, c) }
        }
      }
      .toDF("token", "doc_id", "c")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"), sum(col("c")).as("tf"),
        bottomK(col("doc_id")).as("ids"))
      .filter(col("doc_freq") >= minDf)
      .select(col("token"), col("doc_freq"), col("tf"),
        array_join(col("ids"), ",").as("postings"))
      .orderBy(col("token"))
  }
}

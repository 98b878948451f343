package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * N-gram language-model fluency scoring — the CCNet-style quality filter
 * (Wenzek et al. 2020: score Common Crawl documents by the perplexity of a
 * small LM trained on a trusted slice; keep the fluent band). Here the LM is
 * a pruned add-one bigram model trained on a corpus slice (e.g. the docs
 * already language-identified as the target language), and the score is the
 * document's total SURPRISE in integer bits:
 *
 *   bits(doc) = sum over consecutive token pairs (w1, w2) of
 *               bitLen(c1(w1) + V) - bitLen(c2(w1, w2) + 1)
 *
 * where c1/c2 are the pruned training counts (0 when pruned or unseen), V is
 * the training vocabulary size, and bitLen(n) = floor(log2 n) + 1. This is
 * -log2 of the add-one bigram probability (c2+1)/(c1+V) quantized to whole
 * bits — each term is within 1 bit of the real surprise, and every term is a
 * small INTEGER, so the per-doc sum is order-independent and byte-identical
 * on any partitioning or re-run (determinism at 100 TB is a feature: a
 * re-executed task can never flip a keep decision). Swapping bitLen for
 * Math.log recovers the continuous score — one line, same plan shape.
 *
 * Shape for 100 TB: training runs on the SLICE (CCNet trains on Wikipedia,
 * not on the crawl): one token-keyed and one bigram-keyed exchange over
 * slice-sized data, pruned to `maxUnigrams`/`maxBigrams` by a total order
 * (count desc, key asc — deterministic). The pruned model is a driver map of
 * at most maxUnigrams + maxBigrams entries, BROADCAST to executors; scoring
 * the full corpus is then a single mapPartitions kernel pass — zero shuffle,
 * no join, the filter column lands next to the document. The ordered output
 * here is for the oracle; production callers drop the orderBy.
 */
object LmScore {

  /** q13/q54 tokenizer contract: UTF8String lowercasing (byte-identical to
    * the `lower()` Column), ASCII-whitespace split, empties dropped. */
  def tokens(text: String): Array[String] = {
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    lowered.split("\\s+").filter(_.nonEmpty)
  }

  /** floor(log2 n) + 1 for n >= 1 (the bit length of n). */
  def bitLen(n: Long): Int = {
    require(n >= 1, s"bitLen of non-positive $n")
    64 - java.lang.Long.numberOfLeadingZeros(n)
  }

  /** Pruned bigram model. Bigram keys are w1 + "" + w2 (Java's \\s does NOT
    * match U+0001, so a raw whitespace-split token COULD contain the
    * separator and collide with a bigram key — [[lmTokens]] excludes such
    * tokens from the LM stream; the oracle replays the same exclusion). */
  final case class Model(uni: Map[String, Long], bi: Map[String, Long],
                         vocab: Long) {
    require(vocab >= 1, "empty training vocabulary")
  }

  def bigramKey(w1: String, w2: String): String = w1 + "" + w2

  /** The LM token stream: [[tokens]] minus any token containing the bigram
    * separator U+0001 (a control char, never legitimate text); survivors
    * close ranks, so adjacency is over the filtered sequence. */
  def lmTokens(text: String): Array[String] =
    tokens(text).filter(_.indexOf(1.toChar) < 0)

  /** Train on `train`'s text column: exact token/bigram counts (one
    * token-keyed + one bigram-keyed exchange, map-side combined via the
    * per-doc pre-aggregation), pruned to the top `maxUnigrams`/`maxBigrams`
    * by (count desc, key asc) — a total order, so the pruned model is
    * identical on every run and cluster size. */
  def train(train: DataFrame, textCol: String,
            maxUnigrams: Int, maxBigrams: Int): Model = {
    require(maxUnigrams > 0 && maxBigrams > 0, "prune caps must be positive")
    val spark = train.sparkSession
    import spark.implicits._
    val toks = train.select(col(textCol).cast("string")).as[String]
      .flatMap { t =>
        if (t == null) Iterator.empty
        else {
          // per-doc pre-aggregation: one (key, count) per distinct key
          val ts = lmTokens(t)
          val m = new java.util.HashMap[String, Long]()
          var i = 0
          while (i < ts.length) {
            m.merge(ts(i), 1L, (a: Long, b: Long) => a + b)
            if (i + 1 < ts.length)
              m.merge(bigramKey(ts(i), ts(i + 1)), 1L, (a: Long, b: Long) => a + b)
            i += 1
          }
          import scala.jdk.CollectionConverters._
          m.entrySet().iterator().asScala.map(e => (e.getKey, e.getValue))
        }
      }
      .toDF("key", "c")
      .groupBy(col("key")).agg(sum(col("c")).as("c"))
      .cache()
    try {
      val isBigram = col("key").contains("")
      val vocab = toks.filter(!isBigram).count()
      def top(df: DataFrame, k: Int): Map[String, Long] =
        df.orderBy(col("c").desc, col("key").asc).limit(k)
          .as[(String, Long)].collect().toMap
      val uni = top(toks.filter(!isBigram).toDF(), maxUnigrams)
      val bi = top(toks.filter(isBigram).toDF(), maxBigrams)
      Model(uni, bi, vocab)
    } finally { toks.unpersist(): Unit }
  }

  /** Score every document: (id, n_bigrams, bits, bits_per_bigram_milli,
    * keep). keep = bits * 1000 <= maxBitsPerBigramMilli * n_bigrams (integer
    * cross-multiply — no float). Docs with < 2 tokens score 0 bits over 0
    * bigrams and are kept. Null text counts as empty. A null (or
    * non-long-castable) id fails loudly — "every document" is the contract,
    * so a row that cannot be identified must not silently vanish from the
    * keep/filter output. `sorted` (default true) orders by id — oracle
    * determinism only; production at scale passes false and skips the
    * range exchange. */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            maxBitsPerBigramMilli: Long, sorted: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val scored = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(java.lang.Long, String)]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, t) =>
          if (id == null) throw new IllegalArgumentException(
            "LmScore.score: null or non-long-castable id — every document " +
              "must carry a long id (a silent drop would lose rows downstream)")
          else {
            val ts = if (t == null) Array.empty[String] else lmTokens(t)
            var bits = 0L
            var n = 0L
            var i = 0
            while (i + 1 < ts.length) {
              val c1 = m.uni.getOrElse(ts(i), 0L)
              val c2 = m.bi.getOrElse(bigramKey(ts(i), ts(i + 1)), 0L)
              bits += bitLen(c1 + m.vocab) - bitLen(c2 + 1)
              n += 1
              i += 1
            }
            (id.longValue, n, bits)
          }
        }
      }
      .toDF("id", "n_bigrams", "bits")
      .select(col("id").as("doc_id"), col("n_bigrams"), col("bits"),
        when(col("n_bigrams") > 0,
          expr("(bits * 1000) div n_bigrams")).otherwise(lit(0L))
          .as("bits_per_bigram_milli"),
        (col("bits") * 1000 <= lit(maxBitsPerBigramMilli) * col("n_bigrams"))
          .as("keep"))
    if (sorted) scored.orderBy(col("doc_id")) else scored
  }
}

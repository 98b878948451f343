package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udf

/**
 * Deduplication operators for large-scale training-data pipelines, over a
 * `documents(doc_id, text, ...)` table.
 *
 * All operators are expressed as Catalyst Column pipelines (whole-stage
 * codegen) except the simhash bit-mix, which is a typed map (per-row
 * imperative bit math). Pair generation never cross-joins the corpus:
 * candidates come from hash buckets (exact), LSH band buckets (minhash) or
 * pigeonhole segments (simhash), so the shuffle volume is O(duplicates),
 * not O(n²) — the property that makes these runnable at 100 TB.
 */
object Dedup {

  /** Exact dedup by content hash: one shuffle (hash-groupBy), keeps the
    * lowest id per cluster. Returns the surviving rows. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = xxhash64(col(textCol))
    val keep = df.withColumn("__h", h)
      .groupBy("__h").agg(min(col(idCol)).as(idCol))
      .drop("__h")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact-dup clusters: (content hash, cluster size, min id) for clusters
    * with >1 member. */
  def exactClusters(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(lower(col(textCol))).as("content_md5"))
      .agg(count(lit(1)).as("cluster_size"), min(col(idCol)).as("keep_id"))
      .filter(col("cluster_size") > 1)

  /** Word n-gram shingles of `textCol` as an array column (codegen-friendly:
    * split + sequence + transform, no UDF). NOT de-duplicated: min-hashing
    * is multiset-invariant, and set semantics (Jaccard) are applied to the
    * 64-bit shingle HASHES, where array_distinct takes the primitive fast
    * path — array_distinct over a string array was measured at ~85% of the
    * whole LSH pipeline's cost. */
  def shingles(textCol: Column, n: Int): Column = {
    val tokens = split(lower(textCol), "\\W+")
    val toks = filter(tokens, t => length(t) > 0)
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /**
   * Scala shingle+hash kernel: tokenize, n-gram, xxhash64 each shingle in
   * one pass. Same shingle strings and the same digest as
   * `xxhash64(shingle)` (seed-42 xxHash64 over UTF-8 bytes), but ~3 orders
   * of magnitude cheaper per document: higher-order Column functions
   * (transform/filter/aggregate) evaluate INTERPRETED per element — the
   * Column formulation of this pipeline measured ~1.7 ms/doc on 300-char
   * documents, all of it expression-interpreter overhead.
   */
  def shingleHashArray(text: String, n: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val count = math.max(toks.length - n, 0) + 1
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n && i + k < toks.length) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = graft.frontier.SeenBloom.hash64(sb.toString)
      i += 1
    }
    out
  }

  /** MinHash signature from pre-hashed shingles (Scala kernel): lane j of
    * shingle hash h is an xxHash64 chain over (h, j). */
  def minhashFromHashes(hs: Array[Long], numHashes: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val base = XXH64.hashLong(hs(i), 42L)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashLong(j.toLong, base)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /**
   * MinHash + LSH near-duplicate pairs (shingle -> minhash -> band ->
   * bucket-join). Returns (id_a, id_b, est_jaccard) with id_a < id_b and
   * estimated Jaccard >= `threshold`.
   *
   * numHashes/bands control the S-curve; rowsPerBand = numHashes/bands.
   * Candidate generation is an equi-join on (band, bucket) — duplicate-heavy
   * buckets shuffle together, everything else is pruned before any pair is
   * materialized.
   */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sig = minhashSignatures(df, textCol, idCol, numHashes, shingleSize)
    val banded = lshBands(sig, numHashes, bands)

    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** (id, sig) MinHash signature frame — the TABLE you persist as the
    * corpus's near-dup index (one row per doc, `numHashes` longs), and the
    * shared spine of [[minhashLshPairs]] and [[incrementalNearDup]].
    *
    * Both intermediates are cached and that is load-bearing: without the
    * shingle cache, Catalyst's ProjectCollapsing inlines the full shingle
    * pipeline into every one of the `numHashes` hash lanes (measured 30x
    * slowdown at 32 hashes) — and without the signature cache the chain
    * recomputes for both sides of the LSH self-join. The cached frames are
    * tiny — (id, shingle hashes) / (id, numHashes longs). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame =
    signedFrames(df, textCol, idCol, numHashes, shingleSize).sig

  /** The two cached frames behind [[minhashSignatures]], with a release
    * hook. One-shot pipelines can ignore it (caches die with the session);
    * LONG-LIVED sessions running repeated batches (e.g. a daily
    * [[incrementalNearDup]] loop) must call [[SignedFrames.unpersist]]
    * after materializing each batch's results, or executor storage grows
    * by two cached frames per batch forever. */
  final class SignedFrames private[Dedup] (val sig: DataFrame, shh: DataFrame) {
    def unpersist(): Unit = { sig.unpersist(); shh.unpersist(); () }
  }

  def signedFrames(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): SignedFrames = {
    val shingleUdf = udf((t: String) => shingleHashArray(t, shingleSize))
    val sigUdf = udf((hs: Seq[Long]) => minhashFromHashes(hs.toArray, numHashes))
    val shh = df.select(col(idCol).as("id"), shingleUdf(col(textCol)).as("shh"))
      .filter(size(col("shh")) > 0)
      .cache()
    val sig = shh
      .select(col("id"), sigUdf(col("shh")).as("sig"))
      .filter(size(col("sig")) === numHashes)
      .cache()
    new SignedFrames(sig, shh)
  }

  /** (band, bucket, id, sig) LSH rows of a signature frame — `bands` rows
    * per doc; bucket = hash of the band's signature slice, salted by the
    * band index so identical slices in different bands never collide. */
  def lshBands(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    sig.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))), b)))
        .as(Seq("band", "bucket")))
      .select(col("band"), col("bucket"), col("id"), col("sig"))
  }

  /**
   * INCREMENTAL near-dup: match a DELTA batch (today's crawl) against a
   * persisted banded signature index WITHOUT touching the corpus text.
   * Returns (delta_id, index_id, est_jaccard) with est >= `threshold`.
   *
   * Scale shape (100 TB corpus, daily delta):
   *  - only the delta is shingled/signed — the corpus contributes its
   *    (band, bucket, id, sig) index rows, built once per snapshot by
   *    `lshBands(minhashSignatures(...))` and stored bucketed by
   *    (band, bucket), so the candidate equi-join is co-located with zero
   *    index-side shuffle and partition-prunable to the delta's buckets.
   *  - the join output is O(candidate matches), never delta × corpus; the
   *    signature verify (est_jaccard) runs on the joined rows only.
   *  - a delta small enough to broadcast turns the probe into a map-side
   *    join over the index scan (AQE picks this below the threshold).
   */
  def incrementalNearDup(indexBands: DataFrame, delta: DataFrame,
      textCol: String, idCol: String,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame =
    incrementalNearDupSigned(indexBands,
      signedFrames(delta, textCol, idCol, numHashes, shingleSize),
      numHashes, bands, threshold)

  /** [[incrementalNearDup]] over pre-built delta signatures: the form a
    * long-lived daily-delta loop should call — build [[signedFrames]] per
    * batch, materialize the matches, then `frames.unpersist()` so executor
    * storage stays O(one batch) across an unbounded run. */
  def incrementalNearDupSigned(indexBands: DataFrame, deltaFrames: SignedFrames,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7): DataFrame = {
    val dBands = lshBands(deltaFrames.sig, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as("delta_id"), col("sig").as("sig_d"))
    val ix = indexBands
      .select(col("band"), col("bucket"), col("id").as("index_id"), col("sig").as("sig_i"))
    dBands.join(ix, Seq("band", "bucket"))
      .select("delta_id", "index_id", "sig_d", "sig_i")
      .dropDuplicates("delta_id", "index_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_d"), col("sig_i"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select("delta_id", "index_id", "est_jaccard")
  }

  /** 64-bit simhash of whitespace-tokenized text (pure function, used from a
    * typed map — per-row bit math is the one place codegen can't help). */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    text.toLowerCase.split("\\W+").foreach { tok =>
      if (tok.nonEmpty) {
        var h = graft.fixtures.SiteGen.mix(0x5EEDL, tok.hashCode.toLong)
        var i = 0
        while (i < 64) {
          if ((h & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          h >>>= 1
          if (i == 62) h = graft.fixtures.SiteGen.mix(0xBEEFL, tok.hashCode.toLong) // refill bits
          i += 1
        }
      }
    }
    var sh = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) sh |= (1L << i); i += 1 }
    sh
  }

  /**
   * SimHash near-dup pairs with Hamming distance <= maxDist, via pigeonhole
   * banding: split the 64-bit hash into (maxDist+1) segments; any pair within
   * distance maxDist agrees exactly on >=1 segment, so an equi-join per
   * segment finds all candidates; `bit_count(xor)` verifies.
   */
  def simhashPairs(df: DataFrame, simhashCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val segs = maxDist + 1
    val width = 64 / segs
    val banded = df.select(
      col(idCol).as("id"), col(simhashCol).as("sh"),
      posexplode(array((0 until segs).map { s =>
        shiftright(col(simhashCol), s * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("seg", "segval")))
    val a = banded.select(col("seg"), col("segval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("seg"), col("segval"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("seg", "segval"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (id_a, id_b):
    * set intersection over union on word n-gram shingle sets. */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    // Shingle only the docs that appear in a candidate pair (semi-join
    // prune) and cache: both join sides reuse one computation, and at scale
    // the shuffled shingle volume is O(candidates), not O(corpus). The
    // candidate set itself is referenced three times (id prune + two joins),
    // so cache it too — it is typically the output of an LSH pass that is
    // expensive to recompute.
    val p = pairs.cache()
    val ids = p.select(col("id_a").as("id"))
      .union(p.select(col("id_b").as("id"))).distinct()
    // intersect/union over 64-bit shingle hashes, not strings: identical
    // Jaccard up to ~2^-64 collision probability, far cheaper set ops
    val shingleSetUdf = udf((t: String) => shingleHashArray(t, n).distinct)
    val sh = df.select(col(idCol).as("id"), shingleSetUdf(col(textCol)).as("sh"))
      .join(ids, Seq("id"), "left_semi")
      .cache()
    p
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", when(col("uni") > 0, col("inter").cast("double") / col("uni")).otherwise(0.0))
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs: cosine >= threshold, candidates from
    * random-hyperplane LSH buckets (see Similarity.hyperplaneSignature). */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 16, seed: Long = 7L): DataFrame = {
    val mat = Similarity.planeMatrix(df.sparkSession, planes,
      Similarity.vecDim(df, vecCol), seed)
    val withSig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", Similarity.hyperplaneSignatureFast(col("v"), mat))
      .cache() // reused by both sides of the bucket self-join
    val a = withSig.select(col("sig"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withSig.select(col("sig"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosineCol(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}

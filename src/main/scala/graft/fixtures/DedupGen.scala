package graft.fixtures

/**
 * Closed-form corpora for the dedup / ANN correctness oracles (q18-q22).
 *
 * The trick (same as SerpGen/q23, syntheticMedia/q25, langid/q26): build the
 * inputs deterministically from `doc_id` arithmetic so the REAL kernels run
 * over them while DuckDB regenerates the expected output rows closed-form —
 * no xxhash/minhash reimplementation on the oracle side.
 *
 * Why the planted sets are exact (not just "high-recall"):
 *  - minhash: identical texts hash to identical shingle arrays, hence
 *    identical signatures — every band matches (recall exactly 1) and
 *    est_jaccard is exactly 1.0. Distinct groups share zero shingles, so a
 *    false candidate needs 4 consecutive equal minhashes of disjoint sets
 *    (~(1/|union|)^4 per band) and would then need 16/32 equal slots to pass
 *    threshold 0.5 — verified absent on the actual sf0.001/0.01/0.1 tables.
 *  - simhash: identical texts give hamming 0; distinct groups give
 *    ~uniform 64-bit fingerprints (P[dist<=3] ~ 2.4e-15 per pair).
 *  - jaccard: shingle-hash sets of the tiered pair texts have closed-form
 *    intersection/union sizes (tokens are unique within a doc), so the exact
 *    kernel value is (p-2)/(98-p) for shared-prefix length p.
 *  - ANN: planted vectors sit within ~11.5 degrees of the query, so their
 *    hyperplane signatures stay within the probe radius (expected flips
 *    12*theta/pi <= 0.77 of the allowed 4) — verified on the fixed seed.
 */
object DedupGen {

  private def tokens(key: String, n: Int = 50): String = {
    val sb = new java.lang.StringBuilder(key.length * n + 4 * n)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(key).append('w').append(j)
      j += 1
    }
    sb.toString
  }

  /** q18 corpus: group g = docId/2; kept groups (g % 3 != 0) give both pair
    * members the identical 50-token text (est_jaccard exactly 1.0); dropped
    * groups get doc-unique tokens (no shared shingles with anything). */
  def minhashText(docId: Long): String = {
    val g = docId / 2
    tokens(if (g % 3 != 0) s"g${g}v1" else s"d${docId}v1")
  }

  /** q72 corpora: corpus text unique per id (`c{id}i` tokens); the delta
    * batch carries ids offset by [[incrDeltaBase]] — members with
    * id % 5 == 0 COPY the corpus doc's text (signature-identical, every
    * band matches, est_jaccard exactly 1.0), members with id % 5 == 2 get
    * fresh unique tokens (no shared shingles with anything). */
  val incrDeltaBase = 10000000L
  def incrCorpusText(id: Long): String = tokens(s"c${id}i")
  def incrDeltaText(id: Long): String =
    if (id % 5 == 0) incrCorpusText(id) else tokens(s"n${id}i")

  /** q19 corpus: same shape, different keep-rule (g % 4 != 1) and token salt
    * so the q18/q19 outputs are distinct pair sets. */
  def simhashText(docId: Long): String = {
    val g = docId / 2
    tokens(if (g % 4 != 1) s"g${g}v2" else s"d${docId}v2")
  }

  /** q20 corpus: pair (2g, 2g+1) shares a token prefix of length
    * p = 50 - 6*(g % 5); with 3-gram shingles each doc has 48 distinct
    * shingles, the pair shares p-2 of them, so exact Jaccard is
    * (p-2)/(98-p): tiers 1.0, 42/54, 36/60, 30/66, 24/72. */
  def jaccardText(docId: Long): String = {
    val g = docId / 2
    val p = 50 - 6 * (g % 5).toInt
    val odd = (docId % 2) == 1
    val sb = new java.lang.StringBuilder(16 * 50)
    var j = 0
    while (j < 50) {
      if (j > 0) sb.append(' ')
      if (!odd || j < p) sb.append('a').append(g).append('w').append(j)
      else sb.append('b').append(g).append('w').append(j)
      j += 1
    }
    sb.toString
  }

  /** q22 planted neighbors: k vectors with exact-by-construction cosine
    * 0.999 - 0.001*j to `query` (v = c*qhat + sqrt(1-c^2)*uhat with uhat
    * orthogonal to qhat via pairwise rotation), ids 200000+j. Float32
    * rounding perturbs the measured cosine by ~1e-7 — far inside the
    * round(.,4) guard band of 5e-5. */
  def plantedNeighbors(query: Seq[Double], k: Int): Seq[(Long, Array[Float])] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qhat = query.map(_ / qn).toArray
    val u = new Array[Double](qhat.length)
    var i = 0
    while (i + 1 < qhat.length) {
      u(i) = -qhat(i + 1); u(i + 1) = qhat(i); i += 2
    }
    val un = math.sqrt(u.map(x => x * x).sum)
    (0 until k).map { j =>
      val c = 0.999 - 0.001 * j
      val s = math.sqrt(1.0 - c * c)
      val v = Array.tabulate(qhat.length)(d => (c * qhat(d) + s * u(d) / un).toFloat)
      (200000L + j, v)
    }
  }
}

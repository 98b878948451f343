package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Checkpoints

/**
 * Redirect-chain resolution over a (src, dst) redirect table — the
 * frontier-side collapse of HTTP 3xx / meta-refresh chains that the
 * reference handles one hop at a time inside the live fetch loop (Crawlee's
 * got-scraping follow-redirects at `packages/scrape/src/engines/cheerio.ts`
 * fetch options; each hop re-enters the request queue). On a 10^10-URL
 * frontier the same collapse is a BATCH problem: captured redirect records
 * (WARC `response` 3xx entries, `<meta http-equiv=refresh>` pages) form a
 * functional graph `url -> target`, and every frontier URL must be rewritten
 * to its terminal landing page before scheduling so politeness, the seen
 * set, and dedup all key on the page that will actually be fetched.
 *
 * Algorithm: POINTER DOUBLING (path halving). The naive per-hop walk is
 * `maxHops` sequential self-joins — 32 shuffle stages for the default hop
 * budget, each over the full table. Doubling composes the partial function
 * with itself each round (`f' = f∘f`), so `ceil(log2(maxHops)) + 1` rounds
 * cover every chain of length <= maxHops: 6 self-joins instead of 32, each
 * shuffling one constant-width row per source. No driver-side data, no
 * assumption the redirect table fits anywhere — both join sides are the
 * same distributed frame, and each round is re-rooted through
 * [[graft.pipeline.Checkpoints.step]] (constant Catalyst plan size; eager
 * reliable checkpoints + superseded-round deletion when a checkpoint dir is
 * configured, same policy as [[graft.pipeline.Graph]]).
 *
 * Semantics (mirrored exactly by q64's recursive-CTE DuckDB oracle):
 *  - one outgoing edge per source: on duplicate records (re-crawls that
 *    captured different targets) the lexicographically smallest target wins
 *    — deterministic under parallelism, no arbitrary dropDuplicates pick;
 *  - self-redirects (`src == dst`) are dropped — the URL is its own landing
 *    page, not a redirect;
 *  - a source RESOLVES if following edges reaches a URL with no outgoing
 *    edge in <= maxHops hops: `final_url` = that terminal, `hops` = chain
 *    length, `cycle` = false;
 *  - otherwise (a redirect loop, or a chain longer than the hop budget —
 *    exactly the cases a live fetcher aborts with "too many redirects"):
 *    `final_url`/`hops` are NULL and `cycle` = true.
 */
object Redirects {

  /** Resolve every redirect source to its terminal URL.
    *
    * @param redirects records of one redirect hop each
    * @param srcCol    redirecting URL column
    * @param dstCol    redirect-target URL column
    * @param maxHops   chain-length budget; longer chains and loops are
    *                  flagged `cycle` (reference fetchers abort these)
    * @return one row per distinct source: (src, final_url, hops, cycle)
    */
  def resolve(redirects: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 32): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = redirects.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined

    // Functional edge table: min(dst) per src (deterministic), self-loops
    // out. One shuffle on src; everything after joins on pointer columns.
    val edges = redirects
      .select(col(srcCol).cast("string").as("u"), col(dstCol).cast("string").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .groupBy(col("u")).agg(min(col("v")).as("v"))
      .transform(Checkpoints.step)

    // State: src -> (cur pointer, exact hop count, done = cur is terminal).
    // Round k composes the pointer map with itself: a row advances by its
    // target row's full remaining coverage, so hop coverage doubles.
    var f: DataFrame = edges.select(
      col("u"), col("v").as("cur"), lit(1L).as("hops"), lit(false).as("done"))
      .transform(Checkpoints.step)
    val rounds = (64 - java.lang.Long.numberOfLeadingZeros(maxHops.toLong)).toInt + 1
    var k = 0
    while (k < rounds) {
      val b = f.select(col("u").as("bu"), col("cur").as("bcur"),
        col("hops").as("bhops"), col("done").as("bdone"))
      val adv: Column = !col("done") && col("bu").isNotNull && col("hops") <= maxHops
      val fNext = f.join(b, f("cur") === b("bu"), "left")
        .select(
          f("u"),
          when(adv, col("bcur")).otherwise(f("cur")).as("cur"),
          when(adv, f("hops") + col("bhops")).otherwise(f("hops")).as("hops"),
          // not advanced because the pointer has no outgoing edge => the
          // pointer IS the terminal; already-done rows stay done; rows past
          // the hop budget are left un-done and flagged cycle below
          (col("done") || (!col("done") && col("bu").isNull)).as("done"))
        .transform(Checkpoints.step)
      if (reliable) Checkpoints.drop(f)
      f = fNext
      k += 1
    }

    val resolved = col("done") && col("hops") <= maxHops
    f.select(
      col("u").as("src"),
      when(resolved, col("cur")).as("final_url"),
      when(resolved, col("hops").cast("int")).as("hops"),
      (!resolved).as("cycle"))
  }
}

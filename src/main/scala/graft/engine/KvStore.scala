package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * KV/binary side-output sink (SURVEY §2.1 S6) + storage-key scheme (§2.7
 * F10): the Spark-native analog of the reference's Crawlee key-value store
 * writes.
 *
 *  - crawl-data payloads: key `crawl-data-{jobId}-{base64(url)}`, value
 *    `{url, data, crawled_at}` (Base.ts:442-451);
 *  - screenshots: key `screenshot[-fullPage]-{jobId}-{md5(uniqueKey)[0,8)}
 *    .jpeg` (ScreenshotTransformer.ts:104-131) — the browser capture itself
 *    is a declared non-goal, but binary blobs stored under these keys ride
 *    the same table.
 *
 * Layout: one parquet table `(jobId, key, url, contentType, value binary,
 * crawledAt)` partitioned by jobId — a point lookup prunes to one partition
 * and pushes the key equality into the scan; at 10^10 scale this is the
 * bucketed blob side-table next to the results table.
 */
object KvStore {

  /** Base.ts:444 — stable, reversible key for a page's crawl-data blob. */
  def crawlDataKey(jobId: String, url: String): String =
    "crawl-data-" + jobId + "-" + java.util.Base64.getEncoder.encodeToString(
      url.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** ScreenshotTransformer.ts:109-119 — 8-hex-digit request-hash file name. */
  def screenshotKey(jobId: String, uniqueKey: String, fullPage: Boolean = false): String = {
    val reqHash = md5hex(uniqueKey).substring(0, 8)
    if (fullPage) s"screenshot-fullPage-$jobId-$reqHash.jpeg"
    else s"screenshot-$jobId-$reqHash.jpeg"
  }

  /** Store each successful result row as a crawl-data KV entry: the value is
    * the reference's `{url, data, crawled_at}` JSON as UTF-8 bytes. Expects
    * the engine's results schema (CrawlEngine.ExtractedRow). */
  def writeCrawlData(results: DataFrame, dir: String): Unit = {
    val keyUdf = udf((jobId: String, url: String) => crawlDataKey(jobId, url))
    results.filter(col("success"))
      .select(
        col("jobId"),
        keyUdf(col("jobId"), col("url")).as("key"),
        col("url"),
        lit("application/json").as("contentType"),
        to_json(struct(
          col("url"),
          struct(col("title"), col("markdown"), col("text"), col("htmlClean"),
            col("metadata")).as("data"),
          col("timestamp").as("crawled_at"))).cast("binary").as("value"),
        col("timestamp").as("crawledAt"))
      .write.mode("append").partitionBy("jobId").parquet(dir)
  }

  /** Point lookup: partition-pruned (jobId) + key-equality pushdown. */
  def lookup(spark: SparkSession, dir: String, jobId: String, url: String): Option[Array[Byte]] = {
    val key = crawlDataKey(jobId, url)
    spark.read.parquet(dir)
      .filter(col("jobId") === jobId && col("key") === key)
      .select(col("value")).limit(1).collect()
      .headOption.map(_.getAs[Array[Byte]]("value"))
  }
}

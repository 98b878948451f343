package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators (SURVEY §2.9).
 *
 * The reference has no stream semantics — its "streaming" is BullMQ workers
 * with periodic sweeps (Worker.ts:125-329). The Spark-native engine's crawl
 * loop is batch-BSP by design, but three genuinely streaming shapes matter in
 * a production deployment and are provided here:
 *
 *  1. [[windowedEventCounts]] — event-time windowed aggregation with a
 *     watermark (late-data tolerant metrics over a crawl/event firehose; the
 *     streaming analog of the reference's queue-status poll, Worker.ts:125-138).
 *  2. [[sessionize]] — gap-based sessions via `flatMapGroupsWithState` with
 *     event-time timeout (custom state machine; the KeyValueGroupedDataset
 *     path the prompt calls out).
 *  3. [[streamingExtract]] — incremental HTML extraction over a
 *     directory-watched pages table (`readStream.parquet` -> the same
 *     mapPartitions kernel the batch engine uses -> append sink): new WARC
 *     drops become extracted rows without re-reading the corpus, via
 *     `Trigger.AvailableNow` or continuous micro-batches.
 *
 * All transforms are expressed on unresolved streaming DataFrames so they
 * bind to any source (file, Kafka, MemoryStream in tests).
 */
object Streams {

  // ------------------------------------------------------- 1. windowed aggs

  /** Tumbling-window counts per event type with watermarked event time.
    * Emits (window_start, window_end, event_type, cnt, value_sum). */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("cnt"), col("value_sum"))

  // ------------------------------------------------------ 2. sessionization

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

  final case class SessionState(sessionStart: Long, lastTs: Long, events: Int, valueSum: Double)

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, events: Int, value_sum: Double)

  /**
   * Gap-based sessionization (gap = `gapMillis`): a session closes when no
   * event arrives for the gap duration past the watermark. State is one
   * fixed-size record per active user — O(active users), not O(events) —
   * which is what keeps this runnable on an unbounded firehose.
   */
  def sessionize(events: Dataset[Event], gapMillis: Long = 30 * 60 * 1000L,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
              new java.sql.Timestamp(s.lastTs), s.events, s.valueSum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMillis =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t),
                    events = s.events + 1, valueSum = s.valueSum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.sessionStart),
                    new java.sql.Timestamp(s.lastTs), s.events, s.valueSum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMillis)
            }
            closed.reverseIterator
          }
      }
  }

  // -------------------------------------------- 3. streaming extraction

  final case class StreamPage(url: String, html: Array[Byte])

  final case class StreamExtracted(url: String, title: String, markdown: String,
      text: String, links: Seq[String])

  /** The batch engine's extraction kernel lifted onto a streaming Dataset:
    * works identically over `readStream.schema(...).parquet(dir)` (WARC-drop
    * directory watching) and over MemoryStream in tests. One parse per page,
    * all formats from it. */
  def streamingExtract(pages: Dataset[StreamPage]): Dataset[StreamExtracted] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      it.map { p =>
        val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
        val ex = graft.core.Extractor.extract(p.url, html)
        StreamExtracted(p.url, ex.title, ex.markdown.getOrElse(""),
          ex.text.getOrElse(""), ex.links)
      }
    }
  }

  /** Streaming curation: the batch pipeline's gates lifted onto an
    * unbounded stream. Exact dedup uses `dropDuplicatesWithinWatermark` on
    * the content hash — the dedup state is BOUNDED by the watermark
    * horizon, which is the only shape under which exact dedup is viable on
    * an infinite stream (a cross-history dedup belongs in the batch
    * compaction pass; this mirrors how crawl pipelines split "seen this
    * hour" from "seen ever"). Quality and repetition gates are the same
    * codegen Column expressions as the batch path, evaluated per
    * micro-batch with no extra state. */
  def streamingCurate(docs: DataFrame, qualityMin: Double,
      tsCol: String = "ts", textCol: String = "text",
      watermark: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .withColumn("__h", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__h")
      .filter(graft.pipeline.TextAnalysis.gopherKeep(col(textCol)) &&
        graft.pipeline.TextAnalysis.qualityScore(col(textCol)) >= qualityMin)
      .drop("__h")

  /** File-source convenience: watch `dir` for new page parquet files and
    * return the streaming extracted frame (caller attaches the sink). */
  def streamingExtractFromDir(spark: SparkSession, dir: String): Dataset[StreamExtracted] = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.BinaryType)))
    streamingExtract(
      spark.readStream.schema(schema).parquet(dir).as[StreamPage])
  }
}

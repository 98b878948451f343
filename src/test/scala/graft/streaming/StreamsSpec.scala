package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

class StreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  test("windowed event counts with watermark (append on window close)") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val out = Streams.windowedEventCounts(df, windowLen = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(3), "view", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first window -> it closes and emits
      input.addData((ts(60), "click", 5.0))
      q.processAllAvailable()
      val rows = s.sql("SELECT event_type, cnt, value_sum FROM wincounts ORDER BY event_type").collect()
      assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", 2L, 3.0), ("view", 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming curate: watermark-bounded dedup + quality gate per micro-batch") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val good = "the cat and the dog are in the park with a ball and the sun is out today"
    val junk = "zz qq ww rr tt yy uu ii oo pp"                 // fails quality
    val repet = "spark spark spark spark spark ok"             // fails repetition
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
    val out = Streams.streamingCurate(df, qualityMin = 0.5, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a dup inside the batch, a junk doc, a repetitive doc
      input.addData((ts(1), good), (ts(2), good), (ts(3), junk), (ts(4), repet))
      q.processAllAvailable()
      // batch 2: same content within the watermark window -> still deduped;
      // plus a fresh doc
      input.addData((ts(5), good), (ts(6), good + " fresh"))
      q.processAllAvailable()
      val rows = s.sql("SELECT text FROM curated").collect().map(_.getString(0)).toSeq
      assert(rows.sorted == Seq(good, good + " fresh").sorted,
        s"got: $rows")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: gap split + timeout close") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Streams.Event]
    val out = Streams.sessionize(input.toDS(), gapMillis = 10 * 60000L, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: events at t1,t5 (one session), then t30 (new session after gap)
      input.addData(
        Streams.Event(1L, ts(1), "a", 1.0),
        Streams.Event(1L, ts(5), "a", 2.0))
      q.processAllAvailable()
      input.addData(Streams.Event(1L, ts(30), "a", 3.0))
      q.processAllAvailable()
      // push watermark far ahead so the t30 session times out too
      input.addData(Streams.Event(2L, ts(300), "a", 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(2L, ts(600), "a", 1.0))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, events, value_sum FROM sessions WHERE user_id = 1 ORDER BY session_start")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(rows == Seq((1L, 2, 3.0), (1L, 1, 3.0)))
    } finally q.stop()
  }

  test("streaming extraction over a watched directory matches the batch kernel") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-pages").toString
    val outDir = java.nio.file.Files.createTempDirectory("stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream-ckpt").toString

    // drop 1: first 20 pages; drop 2: 10 more
    val rows = graft.fixtures.SiteGen.rows(42L, 30, 2).toSeq
    s.createDataset(rows.take(20).map(r => Streams.StreamPage(r.url, r.html)))
      .write.parquet(s"$dir/drop1")

    val q = Streams.streamingExtractFromDir(s, s"$dir/*")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    s.createDataset(rows.drop(20).map(r => Streams.StreamPage(r.url, r.html)))
      .write.parquet(s"$dir/drop2")
    val q2 = Streams.streamingExtractFromDir(s, s"$dir/*")
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)

    val got = s.read.parquet(outDir).selectExpr("url", "title", "markdown", "text")
      .collect().map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(got.size == 30) // incremental: drop2 processed exactly once, no re-read
    rows.foreach { r =>
      val ex = graft.core.Extractor.extract(r.url, new String(r.html, "UTF-8"))
      val g = got(r.url)
      assert(g._1 == ex.title && g._2 == ex.markdown.getOrElse("") && g._3 == ex.text.getOrElse(""))
    }
  }
}

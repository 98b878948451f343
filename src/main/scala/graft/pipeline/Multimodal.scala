package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column processing for training-data pipelines: image/audio/video
 * as opaque `binary` columns with typed metadata, processed batch-wise in
 * `mapPartitions` (the Scala analog of `mapInPandas` — same batch shape, same
 * schema contract).
 *
 * The payloads use the documented GMB1 container ([[MediaCodec]]) and the
 * decode / feature-extract / resize / frame-sample steps are REAL parsers
 * and kernels over it — not stubs. What this sandbox cannot provide is
 * real-world codec libraries (JPEG/PNG/MP3/H.264): in production those
 * replace [[MediaCodec.decode]] one-for-one; every Spark-side contract
 * (schema, partition batching, feature shapes, corrupt-payload fallback)
 * is exercised as-is.
 */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(modality: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long, codec: String)

  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, modality: String,
      feature: Array[Float], frames: Int, bytes: Long, decodeOk: Boolean)

  /**
   * GMB1 — "Graft Media Binary v1", the synthetic container the test corpus
   * ships (a stand-in for real codecs with a REAL binary parse):
   *
   *   magic "GMB1" (4B) | modality (1B: 0=image 1=audio 2=video)
   *   image: w u16 | h u16 | w*h gray bytes (row-major)
   *   audio: sampleRate i32 | n u16 | n samples i16 (PCM)
   *   video: frames u16 | w u16 | h u16 | frames * (w*h gray bytes)
   *
   * Malformed input (bad magic, truncated body) decodes to None — the
   * pipeline's corrupt-blob path.
   */
  object MediaCodec {
    val Magic: Array[Byte] = "GMB1".getBytes("US-ASCII")

    sealed trait Decoded
    final case class Image(w: Int, h: Int, pixels: Array[Byte]) extends Decoded
    final case class Audio(sampleRate: Int, samples: Array[Short]) extends Decoded
    final case class Video(w: Int, h: Int, frames: Array[Array[Byte]]) extends Decoded

    private def buf(payload: Array[Byte]) = java.nio.ByteBuffer.wrap(payload)

    def encodeImage(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == w * h)
      val b = java.nio.ByteBuffer.allocate(4 + 1 + 4 + pixels.length)
      b.put(Magic).put(0.toByte).putShort(w.toShort).putShort(h.toShort).put(pixels)
      b.array()
    }

    def encodeAudio(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(4 + 1 + 4 + 2 + samples.length * 2)
      b.put(Magic).put(1.toByte).putInt(sampleRate).putShort(samples.length.toShort)
      samples.foreach(b.putShort)
      b.array()
    }

    def encodeVideo(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      frames.foreach(f => require(f.length == w * h))
      val b = java.nio.ByteBuffer.allocate(4 + 1 + 6 + frames.length * w * h)
      b.put(Magic).put(2.toByte).putShort(frames.length.toShort)
        .putShort(w.toShort).putShort(h.toShort)
      frames.foreach(b.put)
      b.array()
    }

    def decode(payload: Array[Byte]): Option[Decoded] = {
      if (payload == null || payload.length < 5) return None
      if (!java.util.Arrays.equals(payload.slice(0, 4), Magic)) return None
      try {
        val b = buf(payload); b.position(4)
        b.get() match {
          case 0 =>
            val w = b.getShort & 0xFFFF; val h = b.getShort & 0xFFFF
            if (b.remaining() < w * h) None
            else { val px = new Array[Byte](w * h); b.get(px); Some(Image(w, h, px)) }
          case 1 =>
            val rate = b.getInt; val n = b.getShort & 0xFFFF
            if (b.remaining() < n * 2) None
            else Some(Audio(rate, Array.fill(n)(b.getShort)))
          case 2 =>
            val nf = b.getShort & 0xFFFF
            val w = b.getShort & 0xFFFF; val h = b.getShort & 0xFFFF
            if (b.remaining() < nf * w * h) None
            else Some(Video(w, h, Array.fill(nf) { val f = new Array[Byte](w * h); b.get(f); f }))
          case _ => None
        }
      } catch { case _: Exception => None }
    }

    /** Nearest-neighbor resize — a REAL raster kernel (the resize step of
      * an image pipeline). */
    def resize(img: Image, w2: Int, h2: Int): Image = {
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = y * img.h / h2
        var x = 0
        while (x < w2) {
          out(y * w2 + x) = img.pixels(sy * img.w + (x * img.w / w2))
          x += 1
        }
        y += 1
      }
      Image(w2, h2, out)
    }
  }

  import MediaCodec._

  private def meanStd(bytes: Array[Byte]): (Float, Float) = {
    if (bytes.isEmpty) return (0f, 0f)
    var s = 0.0; var s2 = 0.0
    bytes.foreach { p => val v = (p & 0xFF).toDouble; s += v; s2 += v * v }
    val m = s / bytes.length
    (m.toFloat, math.sqrt(math.max(0, s2 / bytes.length - m * m)).toFloat)
  }

  /** Real features per modality, padded/truncated to `dim`:
    * image = [mean, std, 8-bin histogram, 2x2 pooled means];
    * audio = [rms, zero-crossing rate, 8 frame energies];
    * video = per-frame means. */
  def features(d: Decoded, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    def put(i: Int, v: Float): Unit = if (i < dim) out(i) = v
    d match {
      case img: Image =>
        val (m, sd) = meanStd(img.pixels)
        put(0, m); put(1, sd)
        val hist = new Array[Int](8)
        img.pixels.foreach(p => hist((p & 0xFF) >> 5) += 1)
        (0 until 8).foreach(i => put(2 + i, hist(i).toFloat / math.max(1, img.pixels.length)))
        val pooled = resize(img, 2, 2)
        (0 until 4).foreach(i => put(10 + i, (pooled.pixels(i) & 0xFF).toFloat))
      case Audio(_, samples) =>
        if (samples.nonEmpty) {
          var e = 0.0; var zc = 0
          var i = 0
          while (i < samples.length) {
            e += samples(i).toDouble * samples(i)
            if (i > 0 && ((samples(i) >= 0) != (samples(i - 1) >= 0))) zc += 1
            i += 1
          }
          put(0, math.sqrt(e / samples.length).toFloat)
          put(1, zc.toFloat / samples.length)
          val frame = math.max(1, samples.length / 8)
          (0 until 8).foreach { f =>
            val sl = samples.slice(f * frame, math.min((f + 1) * frame, samples.length))
            if (sl.nonEmpty) put(2 + f, math.sqrt(sl.map(s => s.toDouble * s).sum / sl.length).toFloat)
          }
        }
      case Video(_, _, frames) =>
        frames.take(dim).zipWithIndex.foreach { case (f, i) => put(i, meanStd(f)._1) }
    }
    out
  }

  /** Feature extraction over media batches: one partition = one batch, the
    * GMB1 decode + feature kernels per row; corrupt payloads produce a
    * zero-feature row flagged `decodeOk = false` (never a task failure). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { batch =>
      batch.map { r =>
        decode(r.payload) match {
          case Some(d) =>
            val frames = d match {
              case v: Video => v.frames.length
              case a: Audio => math.max(1, a.samples.length / math.max(1, a.sampleRate))
              case _: Image => 1
            }
            MediaFeatures(r.media_id, r.modality, features(d, dim), frames,
              r.payload.length.toLong, decodeOk = true)
          case None =>
            MediaFeatures(r.media_id, r.modality, new Array[Float](dim), 0,
              if (r.payload == null) 0L else r.payload.length.toLong, decodeOk = false)
        }
      }
    }
  }

  /** Frame sampling: pick every `stride`-th frame index deterministically —
    * column-level shape used when only indexes are needed downstream. */
  def sampleFrameIndexes(df: DataFrame, framesCol: String, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      filter(sequence(lit(0), greatest(col(framesCol) - 1, lit(0))), i => i % stride === 0))

  final case class SampledFrame(media_id: Long, frameIdx: Int, mean: Float)

  /** REAL frame sampling: decode the video container and emit every
    * `stride`-th frame's raster mean (the batch shape of a frame-dataset
    * builder). Non-video / corrupt rows yield nothing. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int): Dataset[SampledFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { batch =>
      batch.flatMap { r =>
        decode(r.payload) match {
          case Some(Video(_, _, frames)) =>
            frames.indices.collect {
              case i if i % stride == 0 => SampledFrame(r.media_id, i, meanStd(frames(i))._1)
            }
          case _ => Nil
        }
      }
    }
  }

  /** Perceptual average-hash (aHash) of a raster: nearest-neighbor resize
    * to 8x8 (the existing [[MediaCodec.resize]] kernel), integer mean over
    * the 64 cells, bit i set iff cell i is strictly above the mean. The
    * classic near-dup key for images — identical rasters always collide;
    * re-encoded/rescaled variants usually do; random rasters collide at
    * ~2^-64. */
  private def aHashAndMean(img: Image): (Long, Long) = {
    val r = resize(img, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += (r.pixels(i) & 0xFF); i += 1 }
    val mean = sum / 64
    var h = 0L
    i = 0
    while (i < 64) {
      if ((r.pixels(i) & 0xFF) > mean) h |= (1L << i)
      i += 1
    }
    (h, mean)
  }

  def aHash64(img: Image): Long = aHashAndMean(img)._1

  private def payloadHash(payload: Array[Byte]): Long =
    if (payload == null) 0L
    else org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      payload, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      payload.length, 42L)

  /** Dedup key of a raster: the [[aHash64]] threshold bits FOLDED WITH the
    * quantized 8x8 mean. The pure aHash maps every flat (constant) raster
    * to 0 regardless of gray level — an all-black and an all-white image
    * would silently merge, and any two videos opening on the same flat
    * lead-in frame would merge with probability 1. Folding the mean keeps
    * those apart; the trade-off (a uniform brightness shift changes the
    * key) is acceptable because this stage targets exact/near-exact
    * re-encodes, not photometric variants. */
  private def rasterKey(img: Image): Long = {
    val (bits, mean) = aHashAndMean(img)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(bits, mean)
  }

  /** Modality-aware media dedup: images key on [[rasterKey]] (aHash bits +
    * mean), videos on the raster key of their FIRST frame (the thumbnail
    * heuristic), audio / undecodable / null / zero-area payloads on exact
    * payload bytes (xxHash64) — degenerate rasters never crash the task,
    * mirroring extractFeatures' corrupt-payload contract. ONE kernel scan
    * derives the key (the keyed frame is checkpointed, so the aggregate
    * and the join probe read it, not the decode); clustering is the q11
    * exact-dedup layout — groupBy over (modality, key) so only (key, id)
    * pairs shuffle, the payload bytes stay at rest. Returns (media_id,
    * modality, cluster_size, keep) with the lowest id kept per cluster. */
  def dedupClusters(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val keyed = Checkpoints.step(ds.map { r =>
      val key = decode(r.payload) match {
        case Some(img: Image) if img.w > 0 && img.h > 0 && img.pixels.nonEmpty =>
          rasterKey(img)
        case Some(v: Video)
            if v.frames.nonEmpty && v.w > 0 && v.h > 0 && v.frames(0).nonEmpty =>
          rasterKey(Image(v.w, v.h, v.frames(0)))
        case _ => payloadHash(r.payload)
      }
      (r.media_id, r.modality, key)
    }.toDF("media_id", "modality", "dedup_key"))
    val clusters = keyed.groupBy("modality", "dedup_key")
      .agg(count(lit(1)).as("cluster_size"), min("media_id").as("keep_id"))
    keyed.join(clusters, Seq("modality", "dedup_key"))
      .select(col("media_id"), col("modality"), col("cluster_size"),
        (col("media_id") === col("keep_id")).as("keep"))
  }

  /** Deterministic synthetic GMB1 corpus for tests/benches. Sizes and frame
    * counts are CLOSED-FORM in `i` (simple `*`/`%` arithmetic a SQL oracle
    * can mirror); payload *content* stays hash-derived — it feeds features,
    * not the size/frame aggregates. With `corruptEvery > 0`, every
    * `corruptEvery`-th row gets its magic clobbered (the corrupt-payload
    * path: decodeOk=false, frames=0, bytes unchanged). */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L,
      corruptEvery: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      def rnd(j: Long): Long = graft.fixtures.SiteGen.mix(seed + i, j)
      val modality = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = modality match {
        case "image" =>
          val w = 8 + ((i * 7) % 16).toInt; val h = 6 + ((i * 5) % 16).toInt
          MediaCodec.encodeImage(w, h, Array.tabulate(w * h)(j => (rnd(3 + j) & 0xFF).toByte))
        case "audio" =>
          val len = 64 + ((i * 11) % 256).toInt
          MediaCodec.encodeAudio(16000, Array.tabulate(len)(j => (rnd(3 + j) & 0x7FFF).toShort))
        case _ =>
          val w = 8; val h = 6
          val nf = 2 + ((i * 3) % 8).toInt
          MediaCodec.encodeVideo(w, h,
            (0 until nf).map(f => Array.tabulate(w * h)(j => (rnd(100L * f + j) & 0xFF).toByte)))
      }
      if (corruptEvery > 0 && i % corruptEvery == 0) payload(0) = 'X'.toByte
      MediaRow(i, modality, payload,
        MediaMeta(modality, 0, 0,
          if (modality == "audio") 16000 else 0,
          if (modality == "image") 0L else 1000L + (i % 60000), "gmb1"))
    }
  }
}

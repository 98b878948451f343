package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing for training-data pipelines: image/audio/video
 * as opaque `binary` columns with typed metadata, processed batch-wise in
 * `mapPartitions` (the Scala analog of `mapInPandas` — same batch shape, same
 * schema contract).
 *
 * The actual media decode is STUBBED (no image/audio libraries in this
 * container): `decodeStub` derives deterministic pseudo-features from the
 * bytes. Everything around it — schema, partition sizing, batch iteration,
 * output contract — is real and tested, so swapping in a real decoder is a
 * one-function change.
 */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(modality: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long, codec: String)

  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(media_id: Long, modality: String,
      feature: Array[Float], frames: Int, bytes: Long)

  /** ??? in spirit — a clearly-marked stand-in for the real decoder.
    * Deterministic in the payload bytes so tests are stable. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < payload.length) {
      h = graft.fixtures.SiteGen.mix(h, payload(i).toLong)
      out(i % dim) += ((h % 1000L) / 1000.0f)
      i += 1
    }
    out
  }

  /** Feature extraction over media batches: one partition = one batch, the
    * decoder invoked per row, vectorized output schema. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { batch =>
      batch.map { r =>
        val f = decodeStub(r.payload, dim)   // <- real decoder goes here
        val frames = r.meta.modality match {
          case "video" => math.max(1, (r.meta.durationMs / 40L).toInt) // 25 fps
          case "audio" => math.max(1, (r.meta.durationMs / 1000L).toInt)
          case _ => 1
        }
        MediaFeatures(r.media_id, r.modality, f, frames, r.payload.length.toLong)
      }
    }
  }

  /** Frame sampling: pick every `stride`-th frame index deterministically —
    * the plan-level shape of video frame-sampling (the decode itself being
    * the stub). Pure Column expressions. */
  def sampleFrameIndexes(df: DataFrame, framesCol: String, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      filter(sequence(lit(0), greatest(col(framesCol) - 1, lit(0))), i => i % stride === 0))

  /** Deterministic synthetic media corpus for tests/benches. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val modality = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 64 + (graft.fixtures.SiteGen.mix(seed, i) & 0xFF).toInt
      val payload = Array.tabulate[Byte](len)(j => (graft.fixtures.SiteGen.mix(seed + i, j.toLong) & 0x7F).toByte)
      MediaRow(i, modality, payload,
        MediaMeta(modality, 64 + (i % 512).toInt, 64 + (i % 256).toInt,
          if (modality == "audio") 16000 else 0,
          if (modality == "image") 0L else 1000L + (i % 60000), "stub"))
    }
  }
}

package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake so the Spark-side contract —
  * schema, partition-parallel batching, feature shapes — is real and
  * tested. Swap [[MediaCodec.decode]] for a real codec (javacv /
  * ImageIO / ffmpeg bindings) to productionize; nothing else changes.
  *
  * Scale: `mapPartitions` over the binary column is the Scala analog
  * of arrow-batched python UDFs — one codec instance per partition,
  * no per-row setup, no driver involvement; repartition upstream by
  * payload size if media files skew.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      format: String,       // sniffed container format
      width: Int,           // images/video (stub: derived)
      height: Int,
      duration_ms: Long,    // audio/video (stub: derived)
      digest: String)

  case class MediaFeatures(media_id: Long, embedding: Array[Float])

  case class FrameSample(media_id: Long, frame_index: Int, frame_digest: String)

  /** STUB codec — deterministic fake in place of a real decoder. */
  object MediaCodec {
    private def sha(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("SHA-256").digest(bytes)

    def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

    /** ??? real impl: decode container header (PNG/JPEG/WAV/MP4...).
      * Deterministic fake: dimensions/duration derived from the digest
      * so the plumbing has stable, testable values.
      */
    def decode(kind: String, payload: Array[Byte]): (String, Int, Int, Long) = {
      val d = sha(payload)
      val a = java.lang.Byte.toUnsignedInt(d(0))
      val b = java.lang.Byte.toUnsignedInt(d(1))
      kind match {
        case "image" => ("png-stub", 64 + a * 4, 64 + b * 4, 0L)
        case "audio" => ("wav-stub", 0, 0, 1000L + a * 100L)
        case "video" => ("mp4-stub", 320 + a * 2, 240 + b * 2, 5000L + b * 200L)
        case _       => ("bin-stub", 0, 0, 0L)
      }
    }

    /** ??? real impl: model inference over decoded pixels/samples.
      * Deterministic fake: digest bytes → unit-scaled floats.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val d = sha(payload)
      Array.tabulate(dim)(i => java.lang.Byte.toUnsignedInt(d(i % d.length)) / 255.0f)
    }

    /** ??? real impl: seek + decode every k-th frame.
      * Deterministic fake: digest chain per frame index.
      */
    def sampleFrames(payload: Array[Byte], every: Int, max: Int): Seq[(Int, String)] = {
      var cur = sha(payload)
      (0 until max).map { i =>
        cur = sha(cur)
        (i * every, hex(cur).take(16))
      }
    }

    /** ??? real impl: decode → scale to (w, h) → re-encode.
      * Deterministic fake: digest-seeded bytes sized ∝ target area, so
      * payload-size accounting downstream behaves like a real resize.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val seed = sha(payload)
      val out = new Array[Byte](math.max(16, w * h / 64))
      var i = 0
      while (i < out.length) { out(i) = seed(i % seed.length); i += 1 }
      out
    }
  }

  /** Decode metadata for every media row, partition-parallel. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one codec context per partition (the expensive init in a real codec)
      rows.map { r =>
        val (fmt, w, h, dur) = MediaCodec.decode(r.kind, r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length, fmt, w, h, dur,
          MediaCodec.hex(MessageDigest.getInstance("SHA-256").digest(r.payload)))
      }
    }
  }

  /** Feature extraction → embedding column, partition-parallel. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map(r =>
      MediaFeatures(r.media_id, MediaCodec.features(r.payload, dim))))
  }

  case class ResizedMedia(media_id: Long, kind: String, width: Int, height: Int,
                          payload: Array[Byte])

  /** Resize image rows to a fixed target, partition-parallel — the
    * normalization step before batch feature extraction. Non-image
    * rows pass through untouched dimensions with their payload.
    */
  def resizeImages(media: Dataset[MediaRow], w: Int = 224, h: Int = 224): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(rows => rows.map { r =>
      if (r.kind == "image") ResizedMedia(r.media_id, r.kind, w, h, MediaCodec.resize(r.payload, w, h))
      else ResizedMedia(r.media_id, r.kind, 0, 0, r.payload)
    })
  }

  /** Frame sampling for video rows (1 row per sampled frame). */
  def sampleFrames(media: Dataset[MediaRow], every: Int = 30, max: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap(r =>
      MediaCodec.sampleFrames(r.payload, every, max)
        .map { case (idx, dg) => FrameSample(r.media_id, idx, dg) })
  }

  /** Build a media table from the documents fixture (text → bytes),
    * cycling kinds — the stand-in corpus for tests and rows-only
    * verification queries.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}

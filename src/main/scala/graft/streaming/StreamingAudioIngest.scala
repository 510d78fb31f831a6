package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.multimodal.AudioPhash

/** Continuous AUDIO ingestion with near-duplicate filtering against
  * all previously admitted clips — the audio instance of
  * [[StreamingBandGate]], completing the modality set next to the
  * text ([[StreamingDedupIngest]]), embedding
  * ([[StreamingEmbedIngest]]), and image ([[StreamingImageIngest]])
  * gates: batch WAV payloads are PCM-decoded and perceptually hashed
  * ([[AudioPhash.ahashes]] — 48-segment energy-contour aHash,
  * partition-parallel), then Hamming-band gated against the
  * persistent parquet band index. The hash is volume-invariant (mean
  * thresholding), so a re-mastered/attenuated twin of an admitted
  * clip drops exactly like a resized image does on the image gate;
  * undecodable payloads drop at their own ledger stage.
  *
  * Reference analog: none — beyond-parity multimodal streaming
  * family.
  */
class StreamingAudioIngest(spark: SparkSession, workDir: String,
                           maxHamming: Int = 3,
                           bands: Int = 4,
                           compactEvery: Int = 16,
                           ledger: Boolean = true)
  extends StreamingBandGate(spark, workDir, maxHamming, bands, compactEvery, ledger) {

  override protected def prefix: String = "audio"

  override protected def hashBatch(batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    AudioPhash.ahashes(
        batch.select(col("media_id"), col("payload")).as[AudioPhash.AudioRow])
      .toDF().select(col("media_id"), col("ahash").as("phash"))
  }
}

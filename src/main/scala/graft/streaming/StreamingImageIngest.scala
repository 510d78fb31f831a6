package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.multimodal.ImagePhash

/** Continuous IMAGE ingestion with near-duplicate filtering against
  * all previously admitted images — the image instance of
  * [[StreamingBandGate]] (which holds the banding / index / ledger /
  * compaction machinery shared with [[StreamingAudioIngest]]): batch
  * images are perceptually hashed ([[ImagePhash.phashes]] — decode +
  * 48-bit aHash, partition-parallel), then gated by Hamming-banded
  * blocking against a PERSISTENT parquet band index, exactly the
  * batch [[ImagePhash.nearDupPairs]] contract made incremental.
  * A resized re-encode hashes to the same 48 bits (the aHash grid is
  * resolution-invariant), so the planted-twin drop is deterministic.
  *
  * Reference analog: none — beyond-parity multimodal streaming
  * family.
  */
class StreamingImageIngest(spark: SparkSession, workDir: String,
                           maxHamming: Int = 3,
                           bands: Int = 4,
                           compactEvery: Int = 16,
                           ledger: Boolean = true)
  extends StreamingBandGate(spark, workDir, maxHamming, bands, compactEvery, ledger) {

  override protected def prefix: String = "image"

  override protected def hashBatch(batch: DataFrame): DataFrame = {
    import batch.sparkSession.implicits._
    ImagePhash.phashes(
        batch.select(col("media_id"), col("payload")).as[ImagePhash.ImageRow])
      .toDF().select(col("media_id"), col("phash"))
  }
}

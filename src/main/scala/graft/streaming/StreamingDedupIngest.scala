package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Continuous corpus ingestion with an optional quality gate and
  * near-dup filtering against ALL previously admitted documents — the
  * streaming twin of [[graft.curation.Curation]]'s batch funnel.
  *
  * The dedup state is deliberately NOT stream state: it is the
  * persistent LSH band index (parquet, one leaf dir per micro-batch).
  * At corpus scale that index is orders of magnitude too big for any
  * state store, but as a plain table it equi-joins each batch in
  * O(batch + collisions). Per batch:
  *
  *   1. map-only minhash signatures for the batch;
  *   2. within-batch near-dup drop (LSH banding, min-id-wins);
  *   3. batch-vs-index band match → drop docs already represented;
  *   4. append the survivors + their band keys, each to a
  *      batch-scoped leaf (`batch_id=<n>`), so a replayed micro-batch
  *      overwrites its own leaves — idempotent under restart.
  *
  * Docs too short to shingle have no signature and are admitted
  * unconditionally (the same contract as the batch dedup family).
  */
class StreamingDedupIngest(spark: SparkSession, workDir: String,
                           simThreshold: Double = 0.9,
                           quality: Option[graft.curation.Curation.Config] = None) {

  private val indexDir = s"$workDir/band_index"
  private val admittedDir = s"$workDir/admitted"

  private def readIndex(): Option[DataFrame] =
    if (Files.isDirectory(Paths.get(indexDir)))
      // drop the batch_id partition column — it would collide with
      // bandMatches' batch-side alias
      Some(spark.read.parquet(indexDir).select(col("corpus_id"), col("band_id"), col("band_hash")))
    else None

  /** The admitted corpus so far (empty before the first batch). */
  def admitted(): Option[DataFrame] =
    if (Files.isDirectory(Paths.get(admittedDir))) Some(spark.read.parquet(admittedDir)) else None

  private[graft] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    // Dedup's internal cache()s must be released on EVERY exit path —
    // an all-duplicate batch that returned early used to leak one
    // cached signature frame per micro-batch on a long-running stream
    try {
      // quality gate first (map-only — cheapest drop wins), then pin
      // the bounded batch so the multi-branch plan below reads the
      // micro-batch source exactly once
      val gated = quality.fold(batch.select(col("doc_id"), col("text")))(cfg =>
        graft.curation.Curation.qualityGate(
          batch.select(col("doc_id"), col("text")), cfg).drop("n_tokens"))
      val docs = gated.localCheckpoint()
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint()

      val intraDrops = Dedup.lshCandidatePairs(sig, "doc_id")
        .filter(col("est_sim") >= simThreshold)
        .select(col("id_b").as("doc_id")).distinct()
      val vsIndex = readIndex() match {
        case Some(index) => Dedup.bandMatches(index, sig, "doc_id")
          .select(col("batch_id").as("doc_id"))
        case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
      }
      val admittedDocs = docs
        .join(intraDrops, Seq("doc_id"), "left_anti")
        .join(vsIndex, Seq("doc_id"), "left_anti")
        .localCheckpoint()

      if (admittedDocs.isEmpty) return
      admittedDocs.write.mode("overwrite").parquet(s"$admittedDir/batch_id=$batchId")
      Dedup.bandKeys(sig.join(admittedDocs.select(col("doc_id")), Seq("doc_id"), "left_semi"), "doc_id")
        .withColumnRenamed("doc_id", "corpus_id")
        .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    } finally spark.sharedState.cacheManager.clearCache()
  }

  /** Watch `watchDir` for JSONL document files (doc_id BIGINT, text). */
  def start(watchDir: String, availableNow: Boolean = false): StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .json(watchDir)
    val writer = stream.writeStream
      .queryName("graft-streaming-dedup-ingest")
      .option("checkpointLocation", s"$workDir/_dedup_checkpoint")
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}

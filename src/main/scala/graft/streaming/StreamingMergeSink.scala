package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.monotonically_increasing_id
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.merge.MergeWriter

/** Streaming keyed-upsert sink: each micro-batch MERGEs into a
  * [[MergeWriter]] bucketed target — the streaming twin of the batch
  * pipeline's Migrate step (SURVEY.md §2.2 K2 + §2.10 C7), i.e. the
  * CDC-style "latest row per key" materialization a change stream
  * feeds.
  *
  * Delivery: checkpointed at-least-once. A replayed micro-batch
  * re-merges the same keys with the same values, and the merge's
  * last-wins-by-key semantics make the replay idempotent on the
  * target — effectively-once, the same argument as the batch path's
  * landing replays. Within one micro-batch, source order wins
  * duplicate keys (`monotonically_increasing_id` order column, the
  * batch Migrate's exact shape).
  *
  * Scale: each micro-batch costs O(touched buckets) target I/O, so a
  * trickle of updates against a huge target stays cheap; the target's
  * single-writer lease serializes this sink against any concurrent
  * batch Migrate writing the same directory.
  */
object StreamingMergeSink {

  /** `deleteCol` names an optional boolean column in the stream: rows
    * where it is true are CDC tombstones — the key is removed from the
    * target instead of upserted (a replayed tombstone re-deletes an
    * already-absent key: still idempotent, a no-op that NEVER inserts —
    * deliberately the CDC contract, not SQL MERGE's T-SQL rule where an
    * unmatched source row falls through to the insert branch). Within a
    * micro-batch the LATEST action per key wins, so an upsert after a
    * delete re-inserts — the change-stream contract.
    */
  def start(updates: DataFrame, targetDir: String, keyCol: String,
            checkpointDir: String,
            buckets: Int = MergeWriter.DefaultBuckets,
            trigger: Trigger = Trigger.ProcessingTime(0L),
            deleteCol: Option[String] = None,
            updateCols: Option[Seq[(String, String)]] = None,
            updateCondCol: Option[String] = None,
            insertCondCol: Option[String] = None): StreamingQuery =
    startByKeys(updates, targetDir, Seq(keyCol), checkpointDir, buckets,
      trigger, deleteCol, updateCols, updateCondCol, insertCondCol)

  /** Composite-key form: the change stream's key is the conjunction of
    * `keyCols` (e.g. (tenant, id)) — same contract as
    * [[MergeWriter.mergeByKeys]].
    *
    * `updateCols` switches matched rows to a partial-column update
    * (the sparse-CDC shape: the change stream carries only the changed
    * columns — each (targetCol, valueCol) pair routes `valueCol` into
    * `targetCol` on match, unlisted columns keep their target values,
    * inserts take the raw stream row). `updateCondCol` names a boolean
    * column guarding the update branch (selective-apply CDC: a matched
    * row where it is false/null takes no action, the target row stays
    * byte-identical; unmatched rows still insert). `insertCondCol`
    * names a boolean column gating admission of NEW keys (filtering
    * CDC consumption: an unmatched row where it is false/null neither
    * inserts nor counts — existing keys still update). There is
    * deliberately no sync-delete option: a change stream is a delta,
    * not a snapshot — full-snapshot synchronization belongs to the
    * batch MERGE surface.
    */
  def startByKeys(updates: DataFrame, targetDir: String, keyCols: Seq[String],
                  checkpointDir: String,
                  buckets: Int = MergeWriter.DefaultBuckets,
                  trigger: Trigger = Trigger.ProcessingTime(0L),
                  deleteCol: Option[String] = None,
                  updateCols: Option[Seq[(String, String)]] = None,
                  updateCondCol: Option[String] = None,
                  insertCondCol: Option[String] = None): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          MergeWriter.mergeByKeys(batch.sparkSession, targetDir,
            batch.withColumn("_src_order", monotonically_increasing_id()),
            keyCols, "_src_order", buckets, deleteCol = deleteCol,
            updateCols = updateCols, updateCondCol = updateCondCol,
            insertCondCol = insertCondCol): Unit
        }
      }
      .start()
}

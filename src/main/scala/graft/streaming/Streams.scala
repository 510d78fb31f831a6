package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10 C7 + the planned-only
  * event triggers, re-expressed Spark-first).
  *
  * - directory-watch ingestion: the streaming twin of the batch file
  *   trigger (one upload = one micro-batch with Trigger.AvailableNow);
  * - watermarked tumbling-window aggregation over event time;
  * - stateful sessionization via flatMapGroupsWithState — the same
  *   30-min-gap semantics as the batch `q_events_sessionize` query.
  */
object Streams {

  /** Watch a landing directory for order CSVs (schema fixed up-front —
    * streaming readers require it).
    */
  def ordersFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema("order_id STRING, customer_id STRING, amount STRING, order_date STRING")
      .csv(dir)

  /** Tumbling event-time window with watermark (late data beyond the
    * watermark is dropped deterministically).
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup with bounded state: a row whose content
    * hash was already seen within the watermark horizon is dropped,
    * and hash state older than the watermark is expired — the
    * unbounded-stream twin of `Dedup.exactGroups`, sized by the
    * horizon rather than the corpus.
    */
  def dedupStream(df: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .withColumn("text_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("text_hash")

  /** Streaming signature dedup: drops rows whose 48-bit simhash was
    * already seen within the watermark horizon — catches trivially
    * reworded near-copies (same token multiset votes) that exact
    * content-hash dedup misses, at the same O(horizon) state cost.
    * The signature is map-only (native one-pass expression), so the
    * only stateful op is the dedup itself; genuine near-dup search
    * (hamming > 0) stays on the batch path, where banding bounds it.
    */
  def simhashDedupStream(df: DataFrame, tsCol: String, textCol: String,
                         watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .withColumn("simhash48",
        graft.functions.TextFns.simhash48(graft.functions.TextFns.tokens(col(textCol))))
      .dropDuplicatesWithinWatermark("simhash48")

  /** Stream-stream attribution join: each left event matched with the
    * same user's right events inside [l.ts, l.ts + window]. The time
    * bound plus watermarks let Spark expire join state on both sides
    * — without them a stream-stream join buffers forever.
    */
  def attributionJoin(left: DataFrame, right: DataFrame,
                      userCol: String = "user_id", tsCol: String = "ts",
                      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r, expr(
      s"l.$userCol = r.$userCol AND r.$tsCol >= l.$tsCol AND r.$tsCol <= l.$tsCol + INTERVAL $window"))
  }

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(sessionId: Long, lastTs: Long, count: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long)

  /** 30-min-gap sessionization with explicit state. Emits the session
    * row each time a session closes (next event starts a new one).
    * State per user is O(1) — this shape survives unbounded streams.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
          var st = state.getOption.getOrElse(SessionState(1L, Long.MinValue, 0L))
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st.lastTs != Long.MinValue && t - st.lastTs > gapMs) {
              closed += SessionOut(userId, st.sessionId, st.count)
              st = SessionState(st.sessionId + 1, t, 1L)
            } else {
              st = st.copy(lastTs = t, count = st.count + 1)
            }
          }
          state.update(st)
          closed.iterator
      }
  }
}

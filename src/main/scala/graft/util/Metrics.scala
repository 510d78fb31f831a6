package graft.util

import org.apache.spark.sql.Observation
import org.apache.spark.sql.graftbridge.ColumnBridge.observedMetrics

/** Non-blocking Observation resolution shared by the batch and
  * streaming runners.
  *
  * Inside `foreachBatch` the observation machinery misbehaves (no
  * listener event, or a schemaless metrics row that NPEs) — so poll
  * briefly, treat ANY failure as absent, and let the caller fall back
  * to an explicit count.
  */
object Metrics {

  def resolve(obs: Observation, timeoutMs: Long = 500): Map[String, Any] = {
    def safe = scala.util.Try(observedMetrics(obs)).getOrElse(Map.empty[String, Any])
    val deadline = System.currentTimeMillis + timeoutMs
    var m = safe
    while (m.isEmpty && System.currentTimeMillis < deadline) {
      Thread.sleep(50); m = safe
    }
    m
  }

  /** Observed long metric `key`, or `fallback` (a real action — only
    * evaluated when the metric never arrives).
    */
  def long(obs: Observation, key: String, fallback: => Long, timeoutMs: Long = 500): Long =
    resolve(obs, timeoutMs).get(key).map(_.asInstanceOf[Long]).getOrElse(fallback)
}

package graft.runner

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

import graft.catalog.RunCatalog

/** Live run progress from executor task metrics (SURVEY.md §2.10 C3 —
  * the reference writes RowsProcessed through a separate connection
  * "early, then every 10,000 rows", `StepProgress.java:8-51`).
  *
  * Tasks are attributed to a run via the `run-<id>` job group the
  * runner sets; record counts accumulate per run and are flushed to
  * the catalog log on the first batch and then every
  * [[ProgressListener.Interval]] records — so pollers (the REST API /
  * GUI) see mid-step progress without waiting for the step commit,
  * exactly the reference's separate-channel design.
  */
class ProgressListener(catalog: RunCatalog) extends SparkListener {

  private val jobToRun = new ConcurrentHashMap[Int, String]()
  private val stageToRun = new ConcurrentHashMap[Int, String]()
  private val processed = new ConcurrentHashMap[String, AtomicLong]()
  private val lastFlush = new ConcurrentHashMap[String, java.lang.Long]()
  // long-lived servers see an unbounded stream of runs — retire the
  // oldest run's counters past a cap so listener memory stays flat
  private val runOrder = new java.util.LinkedHashSet[String]()

  private def trackRun(runId: String): Unit = runOrder.synchronized {
    if (runOrder.add(runId) && runOrder.size > ProgressListener.MaxTrackedRuns) {
      val it = runOrder.iterator()
      val oldest = it.next(); it.remove()
      processed.remove(oldest); lastFlush.remove(oldest)
      jobToRun.entrySet.removeIf(e => e.getValue == oldest)
      stageToRun.entrySet.removeIf(e => e.getValue == oldest)
    }
  }

  // catalog writes are Spark actions — they MUST NOT run on the
  // listener-bus thread (a job launched from a listener callback can
  // deadlock the bus / fail the in-flight run); flush on a dedicated
  // daemon thread, mirroring the reference's separate-connection design
  private val flusher = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-progress-flush"); t.setDaemon(true); t
  })

  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    val group = Option(jobStart.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("")
    if (group.startsWith("run-")) {
      val runId = group.stripPrefix("run-")
      trackRun(runId)
      jobToRun.put(jobStart.jobId, runId)
      jobStart.stageInfos.foreach(si => stageToRun.put(si.stageId, runId))
    }
  }

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val runId = stageToRun.get(taskEnd.stageId)
    if (runId != null && taskEnd.taskMetrics != null) {
      val n = taskEnd.taskMetrics.inputMetrics.recordsRead +
        taskEnd.taskMetrics.outputMetrics.recordsWritten
      if (n > 0) {
        val total = processed.computeIfAbsent(runId, _ => new AtomicLong()).addAndGet(n)
        val last = Option(lastFlush.get(runId)).map(_.longValue).getOrElse(-1L)
        if (last < 0 || total - last >= ProgressListener.Interval) {
          lastFlush.put(runId, total)
          flusher.submit(new Runnable {
            def run(): Unit =
              try catalog.log(runId, "Info", 0, "progress", Some(s"records=$total"))
              catch { case e: Throwable => System.err.println(s"[progress] ${e.getMessage}") }
          })
        }
      }
    }
  }

  /** Records processed so far for a run (0 if none seen). */
  def recordsProcessed(runId: String): Long =
    Option(processed.get(runId)).map(_.get()).getOrElse(0L)
}

object ProgressListener {
  val Interval: Long = 10000L
  val MaxTrackedRuns: Int = 10000
}

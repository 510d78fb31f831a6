package graft.sources

import org.apache.spark.sql.SparkSession

import graft.runner.PipelineRunner

/** Scheduled incremental ingestion composed end-to-end (SURVEY.md §2.1
  * S7 + §2.10 C6 — reference `python_code/projectplan.md:139-141`: the
  * production pattern is a SCHEDULED watermark copy — a trigger fires,
  * the copy pulls rows past the stored watermark into staging, the
  * pipeline ingests them, and the watermark advances afterwards).
  *
  * One [[fire]] =
  *   1. read the incremental JDBC window past the stored watermark
  *      ([[JdbcSource.readIncremental]] — the predicate is pushed to
  *      the database);
  *   2. land it in the landing dir as an atomically-published
  *      single-file CSV ([[BlobLanding]]; the name is unique per fire,
  *      so a replayed window lands a NEW file rather than colliding
  *      with the burned name of a previous attempt);
  *   3. run the 4-step pipeline on the landed file;
  *   4. commit the watermark IF AND ONLY IF the run succeeded.
  *
  * A failed (or crashed) run leaves the watermark unmoved, so the next
  * fire replays the same window — at-least-once delivery, which the
  * pipeline's merge-by-key target collapses to effectively-once.
  * An empty window skips landing and pipeline entirely (`Empty`).
  *
  * Wire into a [[graft.scheduler.ScheduleRunner]] as its firing action:
  * {{{
  *   new ScheduleRunner(dir, _ =>
  *     IncrementalIngestion.fire(spark, runner, url, table, wmCol,
  *       stateDir, landingDir)).start()
  * }}}
  */
object IncrementalIngestion {

  /** What one schedule fire did. `status` is the pipeline run status,
    * or "Empty" when the window had no rows (no run started).
    */
  final case class FireOutcome(status: String, runId: Option[String],
                               landedPath: Option[String], rowsLanded: Long,
                               watermarkCommitted: Boolean)

  def fire(spark: SparkSession, runner: PipelineRunner, url: String, table: String,
           watermarkCol: String, stateDir: String, landingDir: String,
           props: java.util.Properties = new java.util.Properties,
           quoteLiteral: Boolean = false,
           pipelineName: String = "OrdersPipeline"): FireOutcome = {
    val inc = JdbcSource.readIncremental(spark, url, table, watermarkCol, stateDir,
      props, quoteLiteral)
    // early-terminating emptiness probe (take(1) stops the JDBC fetch
    // after the first row) — cheaper than landing and running a whole
    // pipeline on a header-only file
    if (inc.df.isEmpty)
      return FireOutcome("Empty", None, None, 0L, watermarkCommitted = false)
    val name = s"${table.replaceAll("[^A-Za-z0-9_]", "_")}_inc_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val landed = BlobLanding.land(inc.df, landingDir, name, "csv")
    val res = runner.run(landed, pipelineName)
    val ok = res.status == "Success"
    if (ok) inc.commit() // commit-after-landing: crash before this replays
    FireOutcome(res.status, Some(res.runId), Some(landed),
      res.rowsPerStep.getOrElse("Data Pull", 0L), watermarkCommitted = ok)
  }
}

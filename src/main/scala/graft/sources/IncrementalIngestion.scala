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
  *   2. land it in ONE source read: the window is written straight
  *      into a hidden staging dir under landing ([[BlobLanding]]; the
  *      name is unique per fire, so a replayed window lands a NEW file
  *      rather than colliding with the burned name of a previous
  *      attempt), and emptiness is decided from the landed file
  *      itself — an up-front `isEmpty` probe would execute the JDBC
  *      window a second time, doubling source latency per fire;
  *   3. an empty window deletes the staged file and stops (`Empty`);
  *      otherwise the file is atomically renamed into the landing dir
  *      and the 4-step pipeline runs on it;
  *   4. commit the watermark IF AND ONLY IF the run succeeded.
  *
  * A failed (or crashed) run leaves the watermark unmoved, so the next
  * fire replays the same window — at-least-once delivery, which the
  * pipeline's merge-by-key target collapses to effectively-once.
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
           pipelineName: String = "OrdersPipeline"): FireOutcome =
    fireWindow(runner,
      JdbcSource.readIncremental(spark, url, table, watermarkCol, stateDir,
        props, quoteLiteral),
      table, landingDir, pipelineName)

  /** Land-then-run for an already-constructed incremental window —
    * the source query executes exactly ONCE per fire (the landing
    * write); emptiness is read off the landed file, not probed with a
    * second source execution. Public so custom incremental sources
    * (and the execution-count spec) can drive the same path.
    */
  def fireWindow(runner: PipelineRunner, inc: JdbcSource.Incremental, table: String,
                 landingDir: String,
                 pipelineName: String = "OrdersPipeline"): FireOutcome = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val name = s"${table.replaceAll("[^A-Za-z0-9_]", "_")}_inc_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    // stage inside the landing dir (dot-prefixed = hidden from Spark
    // readers and the file-trigger stream watching it) so the publish
    // rename below stays a same-filesystem atomic move
    val stage = Paths.get(landingDir, ".inc_stage")
    sweepStaleStage(stage)
    val staged = Paths.get(BlobLanding.land(inc.df, stage.toString, name, "csv"))
    // emptiness = fewer than two lines (header + at least one data
    // row) — an O(1) peek, not a full re-read of a large landed window
    val hasData = {
      val r = Files.newBufferedReader(staged)
      try r.readLine() != null && r.readLine() != null
      finally r.close()
    }
    if (!hasData) {
      // nothing to ingest: no file ever becomes visible in landing
      Files.deleteIfExists(staged)
      return FireOutcome("Empty", None, None, 0L, watermarkCommitted = false)
    }
    val landed = Paths.get(landingDir, s"$name.csv")
    Files.move(staged, landed, StandardCopyOption.ATOMIC_MOVE)
    val res = runner.run(landed.toString, pipelineName)
    val ok = res.status == "Success"
    if (ok) inc.commit() // commit-after-landing: crash before this replays
    FireOutcome(res.status, Some(res.runId), Some(landed.toString),
      res.rowsPerStep.getOrElse("Data Pull", 0L), watermarkCommitted = ok)
  }

  /** A crash between landing into the staging dir and the atomic
    * publish rename orphans the staged file (and its claim) — nothing
    * else ever looks at them. Best-effort sweep at the start of each
    * fire: anything in `.inc_stage` older than `staleMs` is crash
    * debris (age-based, like BlobLanding's stale-claim takeover; a
    * CONCURRENT fire's staging files are seconds old and untouched).
    */
  private[sources] def sweepStaleStage(stage: java.nio.file.Path,
                                       staleMs: Long = 3600000L): Unit = {
    import java.nio.file.Files
    if (!Files.isDirectory(stage)) return
    val cutoff = System.currentTimeMillis() - staleMs
    try {
      val ls = Files.list(stage)
      try ls.iterator().forEachRemaining { p =>
        try if (Files.isRegularFile(p) &&
              Files.getLastModifiedTime(p).toMillis < cutoff)
          Files.deleteIfExists(p)
        catch { case _: Exception => () } // best-effort, per-file
      } finally ls.close()
    } catch { case _: Exception => () } // sweep failure never blocks a fire
  }
}

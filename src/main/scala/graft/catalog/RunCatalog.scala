package graft.catalog

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.util.UUID

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{LogEntry, PipelineRun, StepRun}

/** Run-control catalog (SURVEY.md §1.1 control tables, §2.2 K3/K4,
  * §2.8 query surface).
  *
  * Driver-side metadata store: runs/steps/logs as parquet append
  * tables under a work dir. This is deliberately NOT a distributed
  * dataset — catalog rows are tiny and written by the driver; only the
  * *queries* over them are Spark plans (so the same API works when the
  * catalog grows to millions of runs).
  *
  * RunNumber is a driver-side synchronized counter persisted to a file
  * (§2.6 A2 — the reference's `MAX+1` SQL pattern is racy; a real
  * sequence is the spec'd intent).
  */
class RunCatalog(spark: SparkSession, val dir: String,
                 clock: () => Long = () => System.currentTimeMillis()) {
  import spark.implicits._

  private val runsDir  = s"$dir/pipeline_runs"
  private val stepsDir = s"$dir/step_runs"
  private val logsDir  = s"$dir/pipeline_logs"
  private val seqFile  = Paths.get(dir, "_run_number")

  Files.createDirectories(Paths.get(dir))

  val stepNames: Seq[String] = Seq("Data Pull", "Extract", "Transform", "Migrate")

  private def now(): Timestamp = new Timestamp(clock())

  private def nextRunNumber(): Long = seqFile.synchronized {
    val n = if (Files.exists(seqFile)) Files.readString(seqFile).trim.toLong + 1 else 1L
    Files.writeString(seqFile, n.toString)
    n
  }

  // one writer at a time per catalog: concurrent appends to the same
  // parquet dir race on the committer's shared _temporary staging dir
  // (the runner's logger vs the progress flusher, §2.10 C3)
  private val writeLock = new Object

  private def append[T <: Product : org.apache.spark.sql.Encoder](rows: Seq[T], path: String): Unit =
    writeLock.synchronized {
      rows.toDS().coalesce(1).write.mode("append").parquet(path)
    }

  /** Create run header (Running) + one Pending step row per step
    * (reference `orchestrator/index.js:32-51`).
    */
  def startRun(pipelineName: String): String = {
    val runId = UUID.randomUUID().toString
    append(Seq(PipelineRun(runId, nextRunNumber(), pipelineName, "Running", now(), None)), runsDir)
    append(stepNames.zipWithIndex.map { case (name, i) =>
      StepRun(runId, i + 1, name, "Pending", 0L, None, None, None)
    }, stepsDir)
    runId
  }

  /** Status transition for a step (Pending→Running→Success/Failed).
    * Parquet has no in-place update: transitions append a new row and
    * readers take the latest per (run_id, step_number) — the same
    * read-side resolution a log-structured store does.
    */
  def updateStep(runId: String, stepNumber: Int, status: String,
                 rowsAffected: Long = 0L, error: Option[String] = None): Unit = {
    val ts = Some(now())
    append(Seq(StepRun(runId, stepNumber, stepNames(stepNumber - 1), status, rowsAffected,
      error, if (status == "Running") ts else None,
      if (status == "Success" || status == "Failed" || status == "Cancelled") ts else None)), stepsDir)
  }

  def finishRun(runId: String, status: String): Unit =
    append(Seq(PipelineRun(runId, -1L, "", status, now(), Some(now()))), runsDir)

  def log(runId: String, level: String, stepNumber: Int, message: String,
          details: Option[String] = None): Unit =
    append(Seq(LogEntry(runId, now(), level, stepNumber, message, details)), logsDir)

  // ---- query surface (§2.8) -------------------------------------------

  /** Lifecycle rank — the append-log's latest state per key is the
    * furthest-progressed status (Pending < Running < terminal).
    */
  private def statusRank = when(col("status") === "Pending", 0)
    .when(col("status") === "Running", 1).otherwise(2)

  private def latestPerKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(statusRank.desc)
    df.withColumn("_rn", row_number().over(w)).filter($"_rn" === 1).drop("_rn")
  }

  def runs(): DataFrame = {
    val raw = spark.read.parquet(runsDir)
    // resolve append-log: the run header carries run_number/name; the
    // finish marker (run_number = -1) carries final status + finished_at
    val headers = raw.filter($"run_number" > 0)
      .select($"run_id", $"run_number", $"pipeline_name", $"started_at")
    val finals = latestPerKey(raw, Seq("run_id"))
      .select($"run_id", $"status", $"finished_at")
    headers.join(finals, Seq("run_id"), "left")
  }

  def steps(runId: String): DataFrame =
    latestPerKey(spark.read.parquet(stepsDir).filter($"run_id" === runId),
      Seq("run_id", "step_number"))
      .orderBy($"step_number") // O3

  /** GET /runs — conjunctive equality filters + top-100 newest (O1). */
  def listRuns(pipelineName: Option[String] = None, status: Option[String] = None): DataFrame = {
    var df = runs()
    pipelineName.foreach(p => df = df.filter($"pipeline_name" === p))
    status.foreach(st => df = df.filter($"status" === st))
    df.orderBy($"started_at".desc).limit(100)
  }

  /** GET /logs — filters + capped top-N newest (O2: default 500, max 2000). */
  def listLogs(runId: Option[String] = None, level: Option[String] = None,
               limit: Int = 500): DataFrame = {
    var df = spark.read.parquet(logsDir)
    runId.foreach(r => df = df.filter($"run_id" === r))
    level.foreach(l => df = df.filter($"level" === l))
    df.orderBy($"log_at".desc).limit(math.min(limit, 2000))
  }

  /** Run detail = header ⊕ steps[] (J2 parent-child assembly). */
  def runDetail(runId: String): DataFrame =
    runs().filter($"run_id" === runId)
      .join(steps(runId).groupBy($"run_id")
        .agg(collect_list(struct($"step_number", $"step_name", $"status", $"rows_affected"))
          .as("steps")), Seq("run_id"), "left")

  /** A4 status rollup across steps + C5 timeout sweep predicate. */
  def runStatusRollup(): DataFrame = {
    val s = latestPerKey(spark.read.parquet(stepsDir), Seq("run_id", "step_number"))
    s.groupBy($"run_id").agg(
      min($"started_at").as("started"),
      max($"finished_at").as("finished"),
      when(array_contains(collect_set($"status"), "Failed"), "Failed")
        .when(array_contains(collect_set($"status"), "Running"), "Running")
        .when(array_contains(collect_set($"status"), "Pending"), "Pending")
        .otherwise("Success").as("rollup_status"))
  }

  /** C5: mark runs Running for more than `hours` as timed out. */
  def sweepTimeouts(hours: Int = 6): Seq[String] = {
    val cutoff = new Timestamp(clock() - hours * 3600L * 1000L)
    val stale = runs().filter($"status" === "Running" && $"started_at" < lit(cutoff))
      .select($"run_id").as[String].collect().toSeq
    stale.foreach(finishRun(_, s"Failed-TimeOut-${hours}Hours"))
    stale
  }
}

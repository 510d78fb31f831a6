package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.RunCatalog
import graft.merge.MergeWriter
import graft.runner.PipelineRunner

/** CLI batch entry — the reference's `node index.js /path/file.csv`
  * (SURVEY.md §3.1): run one source file through the 4-step pipeline
  * and print run/step/target state.
  *
  * Usage: runMain graft.PipelineCli <sourceFile> [workDir]
  */
object PipelineCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PipelineCli <sourceFile> [workDir]")
    val source = args(0)
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_work").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = new RunCatalog(spark, s"$workDir/catalog")
    val runner = new PipelineRunner(spark, catalog, workDir)
    val t0 = System.nanoTime()
    val res = runner.run(source)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"run=${res.runId} status=${res.status} seconds=$secs%.2f rows=${res.rowsPerStep}")
    catalog.steps(res.runId)
      .select("step_number", "step_name", "status", "rows_affected").show(false)
    MergeWriter.readTarget(spark, runner.targetDir).foreach { t =>
      println(s"target rows: ${t.count()}")
      t.orderBy("order_id").show(20, false)
    }
    spark.stop()
    if (res.status != "Success") sys.exit(1)
  }
}

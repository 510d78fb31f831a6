package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.RunCatalog
import graft.http.ApiServer
import graft.runner.PipelineRunner

/** API-server entry — the reference's monitoring/trigger server
  * (`api/server.js` / ApiServlet): REST over the run catalog plus
  * background pipeline triggering.
  *
  * Usage: runMain graft.ServeCli <workDir> [port]
  */
object ServeCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServeCli <workDir> [port]")
    val workDir = args(0)
    val port = if (args.length > 1) args(1).toInt else 8080
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-api")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val catalog = new RunCatalog(spark, s"$workDir/catalog")
    val runner = new PipelineRunner(spark, catalog, workDir)
    val progress = new graft.runner.ProgressListener(catalog)
    spark.sparkContext.addSparkListener(progress)
    val schedules = new graft.scheduler.ScheduleRunner(
      s"$workDir/schedules", sc => runner.run(sc.sourcePath, sc.name)).start()
    val api = new ApiServer(catalog, runner, s"$workDir/uploads", port,
      Some(schedules), Some(progress), streamSession = Some(spark)).start()
    println(s"graft api listening on http://127.0.0.1:${api.boundPort}")
    Thread.currentThread().join()
  }
}

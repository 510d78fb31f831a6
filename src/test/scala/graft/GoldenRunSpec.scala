package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.RunCatalog
import graft.merge.MergeWriter
import graft.runner.PipelineRunner

/** Golden run over a deterministic 20k-row corpus (the reference ships
  * deterministic large-fixture generators — SURVEY.md §5.1: cycling
  * amounts, round-robin customers, cycling dates). Asserts end-state
  * aggregates against independently computed expectations, and that
  * run-scoped reads prune partitions.
  */
class GoldenRunSpec extends SparkSpec {
  import spark.implicits._

  // 14 amounts spanning all buckets incl. the 50/200 edges
  private val amountCycle = Seq(
    "15.99", "25.50", "49.99", "50.00", "75.25", "120.00", "199.99",
    "200.00", "250.10", "320.00", "380.75", "420.40", "460.99", "499.99")

  private def expectedCategory(a: BigDecimal): String =
    if (a < 50) "Low" else if (a < 200) "Medium" else "High"

  test("20k-row deterministic corpus: pipeline aggregates match expectations; reruns stay idempotent") {
    val n = 20000
    val rows = (0 until n).map { i =>
      val amount = amountCycle(i % amountCycle.length)
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(i % 400)
      s"ORD-$i,C${i % 2000},$amount,$date"
    }
    val csv = Files.createTempDirectory("golden").resolve("orders_20k.csv")
    Files.writeString(csv, "OrderId,CustomerId,Amount,OrderDate\n" + rows.mkString("\n") + "\n")

    val work = Files.createTempDirectory("graft_golden").toString
    val cat = new RunCatalog(spark, s"$work/catalog")
    val runner = new PipelineRunner(spark, cat, work)
    val res = runner.run(csv.toString)
    assert(res.status == "Success")
    assert(res.rowsPerStep.values.forall(_ == n))

    val target = MergeWriter.readTarget(spark, runner.targetDir).get
    assert(target.count() == n)

    // category distribution: independently computed from the cycle
    val expected = (0 until n)
      .map(i => expectedCategory(BigDecimal(amountCycle(i % amountCycle.length))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = target.groupBy($"amount_category").count()
      .as[(String, Long)].collect().toMap
    assert(got == expected)

    // decimal sum of amounts survives the pipeline exactly
    val expectedSum = (0 until n).map(i => BigDecimal(amountCycle(i % amountCycle.length))).sum
    val gotSum = target.agg(sum($"amount")).as[BigDecimal].head()
    assert(gotSum == expectedSum)

    // rerun: same row count, everything updated not duplicated
    assert(runner.run(csv.toString).status == "Success")
    assert(MergeWriter.readTarget(spark, runner.targetDir).get.count() == n)

    // run-scoped landing read is partition pruning, not a full scan
    val landing = spark.read.parquet(s"$work/landing_orders")
      .filter($"run_id" === res.runId)
    val scan = landing.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("run_id"))
    assert(landing.count() == n) // only this run's slice despite 2 runs on disk
  }
}

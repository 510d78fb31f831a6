package graft.model

import org.apache.spark.sql.types._

/** Stage schemas for the 4-step pipeline (SURVEY.md §1.1), snake_cased.
  *
  * Landing is all-nullable strings (schema-on-read leniency at the
  * edge — reference `002_landing_staging_target.sql:5-19`); typing
  * happens in Extract via fallible casts (§2.3).
  */
object Schemas {

  /** Canonical business columns, matched case-insensitively at ingest
    * (reference `pull.js:31-33`, `PullStep.java:96-106`).
    */
  val businessColumns: Seq[String] = Seq("order_id", "customer_id", "amount", "order_date")

  /** Accepted header spellings → canonical name (lowercased key). */
  val headerAliases: Map[String, String] = Map(
    "orderid" -> "order_id", "order_id" -> "order_id",
    "customerid" -> "customer_id", "customer_id" -> "customer_id",
    "amount" -> "amount",
    "orderdate" -> "order_date", "order_date" -> "order_date")

  val landing: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("amount", StringType),
    StructField("order_date", StringType),
    StructField("source_type", StringType),
    StructField("raw_payload", StringType),
    StructField("loaded_at", TimestampType)))

  val staging: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("order_id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = false),
    StructField("amount", DecimalType(18, 2)),
    StructField("order_date", DateType),
    StructField("extracted_at", TimestampType)))

  val transformed: StructType = StructType(
    staging.fields.toSeq :+ StructField("amount_category", StringType))

  val target: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("customer_id", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("order_date", DateType),
    StructField("amount_category", StringType),
    StructField("migrated_at", TimestampType)))
}

/** Control-catalog rows (SURVEY.md §1.1 control tables). */
case class PipelineRun(
    run_id: String,
    run_number: Long,
    pipeline_name: String,
    status: String,
    started_at: java.sql.Timestamp,
    finished_at: Option[java.sql.Timestamp])

case class StepRun(
    run_id: String,
    step_number: Int,
    step_name: String,
    status: String,
    rows_affected: Long,
    error_message: Option[String],
    started_at: Option[java.sql.Timestamp],
    finished_at: Option[java.sql.Timestamp])

case class LogEntry(
    run_id: String,
    log_at: java.sql.Timestamp,
    level: String,
    step_number: Int,
    message: String,
    details: Option[String])

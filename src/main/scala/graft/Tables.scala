package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + shared column helpers for the query surface.
  *
  * All queries read the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md): region nation customer supplier part orders
  * lineitem events documents embeddings.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` physical type has varied across driver
    * testdata generations — TIMESTAMP(NANOS) (which Spark's parquet
    * reader rejects; read nanos as long and rebuild, integer division
    * because double would lose precision above 2^53 ns) and
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to a session-TZ TIMESTAMP so every
    * downstream instant function (`unix_micros`, watermarking, lag
    * deltas) sees one type regardless of generation; the session runs
    * in UTC, so the NTZ→LTZ cast maps wall time to the same instant
    * DuckDB's naive-timestamp oracle computes with.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→LTZ cast below is only instant-preserving when the session
    // runs in UTC; pin it here rather than trusting the builder config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Exact decimal product for revenue-style expressions: both factors
    * cast to DECIMAL(18,2) first so the multiply is exact and engine-
    * independent. Double-first products rot at the 2-decimal rounding
    * edge (HALF_UP on shortest-repr vs binary-value rounding).
    */
  def decRevenue(price: org.apache.spark.sql.Column,
                 discount: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2)))).cast("double")

  def decRevenueSql(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (1 - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** Exact decimal sum rendered as double — deterministic across engines.
    *
    * Summing doubles is order-dependent, so a DuckDB oracle and a Spark
    * plan can differ in the last bits. Casting the addends to
    * DECIMAL(18,2) first makes the sum exact (same value on any engine /
    * any order), and the final double render of that exact decimal is
    * identical everywhere.
    */
  def decSum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same pattern for oracle SQL text. */
  def decSumSql(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for repeat-join workloads.
  *
  * Bucketing pre-shuffles a table ONCE at write time: two tables
  * bucketed by the same key into the same bucket count join with no
  * exchange at read time — at 100 TB this converts every fact-to-fact
  * join from a full shuffle into a local zip of bucket files. (Spark
  * bucketing requires the table catalog; plain parquet paths don't
  * carry bucket metadata.)
  */
object Layout {

  def writeBucketed(df: DataFrame, table: String,
                    bucketCol: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the executed plan contains no shuffle exchange — the
    * signal that a join ran co-located on bucketed layout.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** 32-bit Morton (Z-order) code of two 16-bit dimension values —
    * the multi-dimensional clustering key lakehouse layouts use so a
    * range scan on EITHER dimension touches O(√P) of P files instead
    * of all of them (one sort key can only serve one dimension).
    * Pure integer bit-spreading (the standard magic-mask dilation),
    * identical on any engine with shifts and bitwise and/or — no
    * loops, 10 codegen'd ops total. Inputs are masked to 16 bits;
    * callers bucket raw columns down first (quantile rank, modulo,
    * epoch-hour — anything order-preserving per dimension).
    */
  def zorder2(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
      val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
      val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
      (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Range-partition + sort a frame by the Z-code of two bucketed
    * dimensions — the write-side half: parquet row groups then carry
    * tight min/max on BOTH x and y, so either dimension's predicate
    * prunes row groups at scan time.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column,
               numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    df.withColumn("_z", zorder2(x, y))
      .repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}

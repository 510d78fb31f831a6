package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}

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

  /** Range-partition + sort by the Hilbert code — [[zorderBy]]'s twin
    * over [[hilbert2]]: same write cost, strictly tighter per-row-group
    * x/y min-max (consecutive Hilbert codes are always grid neighbors,
    * so a row group never straddles the plane the way Morton's
    * power-of-two jumps force it to).
    */
  def hilbertBy(df: DataFrame, x: Column, y: Column, bits: Int = 10,
                numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    df.withColumn("_h", hilbert2(x, y, bits))
      .repartitionByRange(parts, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  /** Hilbert-curve index of two `bits`-bit dimension values — the
    * space-filling key that strictly dominates [[zorder2]] on
    * locality: consecutive Hilbert codes are ALWAYS grid neighbors
    * (Morton order jumps across the plane at every power-of-two
    * boundary), so range scans on the sorted layout touch fewer row
    * groups for the same 2-D clustering. The trade is cost: Hilbert
    * needs the per-bit quadrant rotation (a native Catalyst
    * expression, [[graft.plans.HilbertKey]] — `bits` loop rounds of
    * integer ops per row; an unrolled Column chain would blow up
    * ~5× per bit once CollapseProject inlines the steps), where
    * Morton is 10 mask-dilation ops. Standard xy2d walk
    * from the top bit down (see Hamilton's compact-Hilbert tech
    * report CS-2006-07 / the classic Wikipedia formulation): at each
    * scale `s = 2^k` the quadrant `(rx, ry)` contributes
    * `s² · ((3·rx) xor ry)` to the distance, then the lower bits are
    * rotated/reflected into the quadrant's frame. Pure positive
    * integer arithmetic — identical on any engine with shifts,
    * and/xor, and CASE — which is what lets a SQL oracle reproduce
    * the codes bit-for-bit. Inputs are masked to `bits` bits; callers
    * bucket raw columns down first, exactly as for [[zorder2]].
    */
  def hilbert2(x: Column, y: Column, bits: Int = 10): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.HilbertKey(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(x.cast("long")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(y.cast("long")),
        bits))

  /** DuckDB SQL text computing [[hilbert2]] over columns named
    * `x`/`y` — one chained CTE per bit, same CASE/mask walk, so the
    * oracle reproduces the Spark codes bit-for-bit. `inner` must
    * yield (idCols…, x, y); the result exposes the same columns plus
    * `hkey`. Kept next to the operator so both sides of the contract
    * evolve together.
    */
  def hilbert2Sql(inner: String, idCols: Seq[String], bits: Int = 10): String = {
    val mask = (1L << bits) - 1L
    val ids = idCols.mkString(", ")
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      val prev = if (i == 0) "hb0" else s"hb$i"
      s"""hb${i + 1} AS (SELECT $ids, x, y,
         |  d + ${s * s} * xor(3 * ((cx >> $k) & 1), ((cy >> $k) & 1)) AS d,
         |  CASE WHEN ((cy >> $k) & 1) = 1 THEN cx
         |       WHEN ((cx >> $k) & 1) = 1 THEN ${s - 1L} - cy ELSE cy END AS cx,
         |  CASE WHEN ((cy >> $k) & 1) = 1 THEN cy
         |       WHEN ((cx >> $k) & 1) = 1 THEN ${s - 1L} - cx ELSE cx END AS cy
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""hb0 AS (SELECT $ids, x, y, x & $mask AS cx, y & $mask AS cy,
       |  CAST(0 AS BIGINT) AS d FROM ($inner)),
       |$steps""".stripMargin
  }
}

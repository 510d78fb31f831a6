package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking (SURVEY.md §2.7 windows at scale).
  *
  * Spark's unpartitioned `Window.orderBy(...)` computes global
  * row_number/ntile correctly but moves every row into ONE task — the
  * shape that dies first at corpus scale. These operators compute the
  * same exact results with both passes fully parallel:
  * range-partition on the sort key (a total order), then global rank =
  * per-partition `row_number` + the broadcast cumulative partition
  * sizes. One extra small aggregation job (the per-partition counts)
  * buys back all the parallelism.
  *
  * The sort columns MUST form a total order (append a unique id as
  * tie-break); ties split across range-partition boundaries would
  * otherwise make ranks run-dependent.
  */
object Ranking {

  /** (frame + rank column, total row count) — shared core.
    *
    * No window at all: the per-partition counts give the global offset
    * of every partition, so the rank is offset + position within the
    * already-sorted partition — a native stateful projection
    * ([[graft.plans.PartitionOffsetRank]]: a codegen'd partition-local
    * counter seeded from the offset array), with NO further exchange.
    * A `Window.partitionBy(pid)` formulation would re-shuffle and
    * re-sort the whole frame on pid, which Catalyst can't elide because
    * range partitioning doesn't satisfy a hash-partition requirement;
    * an RDD `mapPartitionsWithIndex` formulation computes the same
    * thing but breaks whole-stage codegen and column pruning for
    * everything downstream of the rank.
    */
  private def withRank(df: DataFrame, sortCols: Seq[Column], out: String,
                       numPartitions: Int): (DataFrame, Long) = {
    require(sortCols.nonEmpty, "global ranking needs at least one sort column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, spark.sparkContext.defaultParallelism)
    val sorted = graft.util.CacheScope.pin(
      df.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val sizes = sorted.groupBy(spark_partition_id().as("_rk_pid"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)) // ≤ `parts` rows
    // dense per-partition cumulative offsets (empty partitions included:
    // they contribute no rows, but keep successors' offsets aligned)
    val counts = new Array[Long](parts)
    sizes.foreach { case (pid, n) => counts(pid) = n }
    val offsets = new Array[Long](parts)
    var acc = 0L
    var i = 0
    while (i < parts) { offsets(i) = acc; acc += counts(i); i += 1 }
    val ranked = sorted.withColumn(out, org.apache.spark.sql.graftbridge.ColumnBridge
      .column(graft.plans.PartitionOffsetRank(offsets)))
    (ranked, acc)
  }

  /** Exact global 1-based row_number as column `out`, fully parallel. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      out: String = "rank", numPartitions: Int = 0): DataFrame =
    withRank(df, sortCols, out, numPartitions)._1

  /** Exact global INCLUSIVE running sum of `valueCol` (cast to long)
    * in `sortCols` order as column `out`, fully parallel — identical
    * values to `sum(valueCol).over(Window.orderBy(sortCols).rowsBetween
    * (unboundedPreceding, currentRow))` without the single-task global
    * window: range-partition on the sort key, per-partition totals in
    * one small aggregation, then a codegen'd partition-local
    * accumulator seeded with the prefix of the preceding partitions'
    * totals ([[graft.plans.PartitionOffsetRunningSum]]). The result
    * frame is ordered by `sortCols` (range partitions + sorted within).
    */
  def globalRunningSum(df: DataFrame, valueCol: Column, sortCols: Seq[Column],
                       out: String = "running_sum", numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "global running sum needs at least one sort column")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, spark.sparkContext.defaultParallelism)
    val prepared = df.withColumn("_rs_val", valueCol.cast("long"))
    val sorted = graft.util.CacheScope.pin(
      prepared.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*))
    val totals = sorted.groupBy(spark_partition_id().as("_rs_pid"))
      .agg(sum(col("_rs_val")).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
    val perPart = new Array[Long](parts)
    totals.foreach { case (pid, s) => perPart(pid) = s }
    val offsets = new Array[Long](parts)
    var acc = 0L
    var i = 0
    while (i < parts) { offsets(i) = acc; acc += perPart(i); i += 1 }
    sorted.withColumn(out, org.apache.spark.sql.graftbridge.ColumnBridge
        .column(graft.plans.PartitionOffsetRunningSum(offsets,
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("_rs_val")))))
      .drop("_rs_val")
  }

  /** Token-budget corpus selection — the dataset-curation cut "take
    * the best documents until the token budget is spent": rank by
    * `sortCols` (a TOTAL order — append a unique id tie-break), keep
    * the maximal prefix whose INCLUSIVE cumulative `tokensCol` stays
    * within `budget`. Prefix semantics: the first document that
    * overflows the budget is dropped and nothing after it is taken —
    * deterministic, unlike best-fit packing. Fully parallel via
    * [[globalRunningSum]]; at 100 TB this is one range shuffle plus a
    * small totals aggregation, never a single-task window.
    */
  def tokenBudgetSelect(df: DataFrame, budget: Long, tokensCol: Column,
                        sortCols: Seq[Column],
                        cumCol: String = "cum_tokens",
                        numPartitions: Int = 0): DataFrame = {
    require(budget >= 0, s"tokenBudgetSelect needs budget >= 0, got $budget")
    globalRunningSum(df, tokensCol, sortCols, cumCol, numPartitions)
      .filter(col(cumCol) <= budget)
  }

  /** Exact global percent_rank and cume_dist as columns `pctOut` /
    * `cumeOut`, fully parallel — identical values to the
    * `Window.orderBy(sortCols)` forms without the single-task window.
    * `sortCols` must be a TOTAL order (unique tie-break), under which
    * rank == dense position, so `percent_rank = (rank-1)/(n-1)` and
    * `cume_dist = rank/n` are the SQL definitions verbatim (a single
    * IEEE division each — engine-exact). A 1-row frame defines
    * percent_rank as 0.0, like SQL.
    */
  def globalPercentRank(df: DataFrame, sortCols: Seq[Column],
                        pctOut: String = "pct_rank", cumeOut: String = "cume_dist",
                        numPartitions: Int = 0): DataFrame = {
    val (ranked, n) = withRank(df, sortCols, "_rk_rank", numPartitions)
    val pct =
      if (n <= 1L) lit(0.0)
      else (col("_rk_rank") - lit(1L)).cast("double") / lit((n - 1L).toDouble)
    ranked
      .withColumn(pctOut, pct)
      .withColumn(cumeOut, col("_rk_rank").cast("double") / lit(math.max(1L, n).toDouble))
      .drop("_rk_rank")
  }

  /** Exact global ntile(k) as column `out` — identical buckets to
    * `ntile(k).over(Window.orderBy(sortCols))`: SQL ntile FRONT-LOADS
    * the remainder, so the first `n mod k` buckets hold `n div k + 1`
    * rows and the rest `n div k`. (The tempting closed form
    * `(r-1)*k/n + 1` spreads the remainder evenly — it agrees only
    * when k divides n; the property test is what caught that.)
    */
  def globalNtile(df: DataFrame, k: Int, sortCols: Seq[Column],
                  out: String = "tile", numPartitions: Int = 0): DataFrame = {
    require(k >= 1, s"ntile needs k >= 1, got $k")
    val (ranked, n) = withRank(df, sortCols, "_rk_rank", numPartitions)
    val total = math.max(1L, n)
    val qsz = total / k    // small-bucket size (0 when k > n)
    val rem = total % k    // first `rem` buckets are one row larger
    val cut = rem * (qsz + 1)
    // max(qsz,1): the ELSE branch is unreachable when qsz = 0 (cut = n)
    // but the denominator must still be a valid divisor under ANSI SQL
    ranked
      .withColumn(out, expr(
        s"CASE WHEN _rk_rank <= ${cut}L THEN (_rk_rank - 1) div ${qsz + 1}L + 1L " +
          s"ELSE ${rem}L + (_rk_rank - ${cut}L - 1) div ${math.max(qsz, 1L)}L + 1L END"))
      .drop("_rk_rank")
  }
}

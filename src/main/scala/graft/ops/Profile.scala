package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ingest-side sanity report every
  * pipeline wants before trusting a new source: per column, the row
  * count, null count, exact distinct count, and min/max (rendered as
  * strings so heterogeneous columns share one output schema; min/max
  * are computed in the column's NATIVE type first, so numeric columns
  * order numerically, then cast).
  *
  * One aggregation job for all requested columns; the long-format
  * output is a map-side explode of the single stats row. Exact
  * distinct counts over many columns multiply the aggregation's
  * Expand factor — profile wide frames in column groups if that
  * matters; exactness is the point of a profile (use
  * `approx_count_distinct` variants for monitoring dashboards).
  *
  * Doubles: the min/max string is the engine's default double
  * rendering — profile output is for humans/alerts, not for
  * cross-engine hash comparison of float columns.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val missing = columns.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such column(s): ${missing.mkString(", ")}")
    val aggs: Seq[Column] = count(lit(1)).as("_rows") +: columns.flatMap { c =>
      Seq(
        // coalesce: sum over an EMPTY frame is NULL, but the contract
        // is an exact count — an empty table has exactly 0 nulls
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val entries = columns.map { c =>
      struct(lit(c).as("column"), col("_rows").as("n_rows"),
        col(s"_nn_$c").as("n_nulls"), col(s"_nd_$c").as("n_distinct"),
        col(s"_mn_$c").as("min_value"), col(s"_mx_$c").as("max_value"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract checks — the expectation suite run at
  * ingest gates ("no null keys, quantities in range, key unique, FK
  * resolves") with the violation COUNTS as evidence, not just a
  * boolean. The design constraint is pass-count, not check-count:
  * every row-grain check (null / range / regex) compiles into one
  * `sum(when(violation, 1))` inside a SINGLE aggregation over ONE
  * corpus scan; uniqueness rides the same aggregation as
  * `count − count_distinct(key)`. Only referential checks cost a join
  * each — an anti join against the dimension's key set, inherent to
  * the semantics.
  *
  * Output: (check, n_rows, n_violations, pass) — one row per check,
  * `pass = n_violations == 0`, `n_rows` the scanned row count (the
  * denominator a reader turns into a violation rate).
  */
object Expect {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null:$col"
  }
  /** `col` (integer-valued) must lie in [lo, hi]; nulls violate. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Check {
    def name = s"in_range:$col"
  }
  /** `col` must fully match `regex`; nulls violate. */
  final case class Matches(col: String, regex: String) extends Check {
    def name = s"matches:$col"
  }
  /** The column tuple must be unique across the frame. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique:${cols.mkString(",")}"
  }
  /** Every non-null `col` must exist in `dim`'s `dimKey` column. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimKey: String)
      extends Check {
    def name = s"ref:$col"
  }

  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "Expect.run needs at least one check")
    val rowGrain: Seq[(String, Column)] = checks.collect {
      case c @ NotNull(col0) =>
        c.name -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.name -> sum(when(col(col0).isNull ||
          col(col0) < lo || col(col0) > hi, 1L).otherwise(0L))
      case c @ Matches(col0, re) =>
        c.name -> sum(when(col(col0).isNull ||
          !col(col0).rlike("^(?:" + re + ")$"), 1L).otherwise(0L))
      case c @ Unique(cols0) =>
        c.name -> (count(lit(1)) -
          count_distinct(struct(cols0.map(col): _*)))
    }
    val aggCols = count(lit(1)).as("_n") +:
      rowGrain.zipWithIndex.map { case ((_, e), i) => e.as(s"_v$i") }
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val rowFrames = rowGrain.zipWithIndex.map { case ((nm, _), i) =>
      one.select(lit(nm).as("check"), col("_n").as("n_rows"),
        col(s"_v$i").as("n_violations"))
    }
    val refFrames = checks.collect { case c @ RefIntegrity(col0, dim, dimKey) =>
      val orphans = df.filter(col(col0).isNotNull)
        .join(dim.select(col(dimKey).as(col0)).distinct(),
          Seq(col0), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      one.select(col("_n").as("n_rows"))
        .crossJoin(broadcast(orphans))
        .select(lit(c.name).as("check"), col("n_rows"), col("n_violations"))
    }
    (rowFrames ++ refFrames).reduce(_ unionByName _)
      .select(col("check"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}

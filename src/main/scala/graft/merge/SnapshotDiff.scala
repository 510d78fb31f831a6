package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff of two table snapshots — the CDC EXTRACT direction
  * ([[MergeWriter]] is CDC APPLY): given the same table at two
  * versions, emit one row per key that changed, classified as
  * insert / delete / update, with the count of value columns that
  * differ. This is how a downstream consumer learns "what happened
  * between v1 and v7" without replaying the merge log — pair it with
  * [[MergeWriter.readTargetAt]] (any two still-on-disk versions of a
  * bucketed merge target diff in one call) or any two frames sharing
  * a key.
  *
  * Semantics: value columns compare NULL-SAFE (`<=>` — a NULL→value
  * transition is a change, NULL→NULL is not, exactly SQL's
  * IS DISTINCT FROM); keys present in both with zero differing value
  * columns are dropped — the diff of identical snapshots is empty.
  * One full-outer shuffle on the key; the classification and the
  * changed-column count are map-side expressions.
  *
  * Output: (keyCols…, op ∈ {insert, delete, update}, n_changed —
  * differing value columns; the full new-side width for inserts and
  * old-side width for deletes).
  */
object SnapshotDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val valueCols = newDf.columns.filterNot(keyCols.contains).toSeq
    require(valueCols.nonEmpty, "snapshotDiff needs at least one value column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshotDiff needs identical schemas; old has ${oldDf.columns.mkString(",")}, " +
        s"new has ${newDf.columns.mkString(",")}")
    val o = oldDf.select(
      keyCols.map(col) ++ Seq(lit(true).as("_in_old")) ++
        valueCols.map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select(
      keyCols.map(col) ++ Seq(lit(true).as("_in_new")) ++
        valueCols.map(c => col(c).as(s"_n_$c")): _*)
    val nChanged = valueCols
      .map(c => when(!(col(s"_o_$c") <=> col(s"_n_$c")), 1L).otherwise(0L))
      .reduce(_ + _)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        when(col("_in_old").isNull, lit("insert"))
          .when(col("_in_new").isNull, lit("delete"))
          .otherwise(lit("update")).as("op"),
        when(col("_in_old").isNull || col("_in_new").isNull,
          lit(valueCols.size.toLong))
          .otherwise(nChanged).as("n_changed")): _*)
      .filter(col("op") =!= "update" || col("n_changed") > 0L)
  }
}

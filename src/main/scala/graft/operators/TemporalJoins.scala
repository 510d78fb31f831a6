package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as builtins, composed from
  * existing operators (preference (a) in the custom-operator ladder —
  * no custom SparkPlan needed; the compositions shuffle once and
  * scale).
  */
object TemporalJoins {

  /** As-of join: for each left row, the latest right row whose
    * `rightTs <= leftTs` within the same `keys` group (the
    * time-series/backfill join).
    *
    * Implementation: tag + union + running `last(_, ignoreNulls)`
    * window ordered by (ts, tag) — right rows sort before left rows at
    * equal timestamps, so equality matches (>= semantics, like ASOF
    * JOIN in DuckDB/kdb).
    *
    * Scale: ONE shuffle on `keys` (the union is map-side); no range
    * explosion, no per-row probe. Right rows must be unique per
    * (keys, rightTs) — pre-dedupe if not (latest-wins).
    *
    * Output: all left columns + the requested right columns (carried
    * values, null when no prior right row exists).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Map[String, String]): DataFrame =
    asOfDirected(left, right, keys, leftTs, rightTs, rightCols, forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with `rightTs >= leftTs` in the same `keys` group — the
    * "next reading at or after" direction (pandas `merge_asof
    * direction='forward'`, the schedule/next-price lookup). Same
    * one-shuffle union+window machinery as [[asOf]], ordered
    * descending.
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Map[String, String]): DataFrame =
    asOfDirected(left, right, keys, leftTs, rightTs, rightCols, forward = true)

  private def asOfDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTs: String, rightTs: String,
                           rightCols: Map[String, String],
                           forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val carriedTs = "_asof_right_ts"

    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_tag") :+ col(rightTs).as(carriedTs)) ++
        rightCols.map { case (src, dst) => col(src).as(dst) } ++
        leftCols.filterNot(c => keys.contains(c)).map(c => lit(null).as(s"_l_$c")): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_tag") :+ lit(null).cast(
        right.schema(rightTs).dataType).as(carriedTs)) ++
        rightCols.map { case (src, dst) => lit(null).cast(right.schema(src).dataType).as(dst) } ++
        leftCols.filterNot(c => keys.contains(c)).map(c => col(c).as(s"_l_$c")): _*)

    // right rows (_tag 0) sort before left rows at equal _ts in BOTH
    // directions, so equality matches (>= / <= semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("_ts").desc else col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn(carriedTs, last(col(carriedTs), ignoreNulls = true).over(w))
      .withColumns(rightCols.values.map(dst =>
        dst -> last(col(dst), ignoreNulls = true).over(w)).toMap)

    carried.filter(col("_tag") === 1)
      .select(
        (keys.map(col) ++
          leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) :+
          col(carriedTs).as("asof_ts")) ++
        rightCols.values.map(col): _*)
  }

  /** Nearest as-of join: for each left row, the right row with the
    * SMALLEST |rightTs − leftTs| in the same `keys` group, ties going
    * to the earlier (backward) side — pandas `merge_asof
    * direction='nearest'` semantics — with an optional symmetric
    * `toleranceUs` beyond which no match is reported. Adds an
    * `asof_dir` column ('backward' / 'forward', NULL on no match).
    *
    * Composed as [[asOf]] ⊕ [[asOfForward]] + a per-row choice: each
    * direction's as-of already carries that direction's MINIMAL
    * delta, so applying the tolerance and picking the smaller delta
    * afterwards is exact. Two shuffles on `keys` plus one join of the
    * two results on the full left row — left rows must therefore be
    * UNIQUE as tuples (carry a unique id column if not; it rides
    * through).
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightCols: Map[String, String],
                  toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val dsts = rightCols.values.toSeq
    def ren(df: DataFrame, sfx: String): DataFrame =
      ("asof_ts" +: dsts).foldLeft(df)((d, c) => d.withColumnRenamed(c, c + sfx))
    val b = ren(asOf(left, right, keys, leftTs, rightTs, rightCols), "_b")
    val f = ren(asOfForward(left, right, keys, leftTs, rightTs, rightCols), "_f")
    val j = b.join(f, leftCols)
    val db = unix_micros(col(leftTs)) - unix_micros(col("asof_ts_b"))
    val df_ = unix_micros(col("asof_ts_f")) - unix_micros(col(leftTs))
    val within = (d: Column) => toleranceUs.map(t => d <= lit(t)).getOrElse(lit(true))
    val backOk = col("asof_ts_b").isNotNull && within(db)
    val fwdOk = col("asof_ts_f").isNotNull && within(df_)
    val useBack = backOk && (!fwdOk || db <= df_)
    val useFwd = fwdOk && !useBack
    j.select(
      leftCols.map(col) ++
        Seq(when(useBack, col("asof_ts_b")).when(useFwd, col("asof_ts_f")).as("asof_ts"),
          when(useBack, lit("backward")).when(useFwd, lit("forward")).as("asof_dir")) ++
        dsts.map(d => when(useBack, col(d + "_b")).when(useFwd, col(d + "_f")).as(d)): _*)
  }

  /** Bucketed range join: pairs (l, r) with the same `keys` and
    * `rightTs` in `(leftTs + lowerUs, leftTs + upperUs]` (microsecond
    * offsets).
    *
    * Scale: instead of an inequality join (which Spark plans as a
    * broadcast-nested-loop at cluster scale), both sides bucket by
    * `ceil(range width)`; the left side explodes to the 2 candidate
    * buckets, the join is an equi-join on (keys, bucket) and the exact
    * range is a post-filter. Work is proportional to true matches, not
    * |L|×|R|.
    */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String,
                        lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty range")
    val width = upperUs - lowerUs
    // exact integer division — `/` on longs is double division and can
    // flip a bucket at quotient boundaries
    val l = left.withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bucket",
        explode(array(expr(s"(_lus + $lowerUs) div $width"),
          expr(s"(_lus + $upperUs) div $width"))))
      .dropDuplicates(left.columns.toSeq :+ "_bucket")
    val r = right.withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bucket", expr(s"_rus div $width"))
    val joined = l.as("l").join(r.as("r"),
      keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
        col("l._bucket") === col("r._bucket") &&
        col("r._rus") > col("l._lus") + lowerUs &&
        col("r._rus") <= col("l._lus") + upperUs)
    joined.select(
      keys.map(k => col(s"l.$k").as(k)) ++
        left.columns.filterNot(keys.contains).map(c => col(s"l.$c").as(c)) ++
        right.columns.filterNot(c => keys.contains(c)).map(c => col(s"r.$c").as(s"r_$c")): _*)
  }

  /** INTERVAL OVERLAP JOIN: pairs of left/right rows whose
    * `[stCol, enCol]` intervals intersect (s1 ≤ e2 ∧ s2 ≤ e1 —
    * touching counts) within the same `keys` group — the
    * session×promotion / downtime×deploy / exposure-window operator
    * Spark has no native join for (a raw inequality join plans as a
    * broadcast-nested-loop at cluster scale).
    *
    * Scale: the [[bucketedRangeJoin]] recipe generalized to two
    * interval sides — both sides explode to the `bucketWidth`-sized
    * buckets their interval touches, the join is an equi-join on
    * (keys, bucket), the exact overlap predicate is a post-filter,
    * and pairs spanning several shared buckets dedup on the id pair.
    * Two intersecting intervals ALWAYS share the bucket containing
    * the later start, so recall is exactly 1. Work ∝ rows ×
    * (len/bucketWidth + 1) + true matches — bounded when interval
    * lengths are; pick `bucketWidth` near the typical interval length
    * (≤ W/bucket rows explode to ≤ 2 buckets). Refuses intervals with
    * `en < st` loudly rather than silently dropping them.
    *
    * Output: keys + left columns + right columns `r_`-prefixed, one
    * row per overlapping (left, right) pair.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          stCol: String, enCol: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(keys.nonEmpty, "intervalOverlapJoin: at least one key column " +
      "(a keyless overlap join would explode every interval against every other)")
    // the malformed-interval check lives INSIDE the bucket expression
    // (a separate never-read check column would be pruned by the
    // optimizer and silently skip the raise); `div`, never `/` — long
    // double-division can flip a bucket at quotient boundaries
    def buckets(df: DataFrame): DataFrame =
      df.withColumn("_sb", expr(
          s"CASE WHEN $enCol < $stCol THEN CAST(raise_error(" +
            s"'intervalOverlapJoin: interval end before start') AS BIGINT) " +
            s"ELSE $stCol div ${bucketWidth}L END"))
        .withColumn("_bucket",
          explode(sequence(col("_sb"), expr(s"$enCol div ${bucketWidth}L"))))
    val l = buckets(left)
    val r = buckets(right)
    val joined = l.as("l").join(r.as("r"),
      keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _) &&
        col("l._bucket") === col("r._bucket") &&
        col(s"l.$stCol") <= col(s"r.$enCol") &&
        col(s"r.$stCol") <= col(s"l.$enCol") &&
        // count each overlapping pair ONCE: only the shared bucket
        // holding the later interval start emits it (both sides cover
        // that bucket whenever the pair overlaps, so recall stays 1)
        col("l._bucket") === greatest(col("l._sb"), col("r._sb")))
    joined.select(
      keys.map(k => col(s"l.$k").as(k)) ++
        left.columns.filterNot(keys.contains).map(c => col(s"l.$c").as(c)) ++
        right.columns.filterNot(keys.contains).map(c => col(s"r.$c").as(s"r_$c")): _*)
  }

  /** Gaps-and-islands INTERVAL MERGE: collapse overlapping or touching
    * `[stCol, enCol]` intervals (integer bounds, caller's units) per
    * `keys` group into islands — one row per maximal connected span
    * with its start, end, covered width, and member count. The
    * coverage/uptime/session-span operator, and the time-domain twin
    * of the dedup family's byte-offset span merges.
    *
    * A new island starts exactly when an interval's start exceeds the
    * RUNNING MAX end of every earlier interval in the (stCol, idCol)
    * order — overlap-chaining, NOT a lag-based gap check: a long
    * interval can fully swallow several short ones whose PAIRWISE gaps
    * look like breaks, and only the running max sees over them.
    * Touching intervals (start == previous end) merge; `idCol` (a
    * unique id) breaks start-time ties so island numbering is
    * deterministic on any engine.
    *
    * Scale: two windows + one aggregate, all inside the `keys`
    * partition — one shuffle on the keys, no global window, fully
    * parallel across groups at any corpus size.
    */
  def mergeIntervals(df: DataFrame, keys: Seq[String], stCol: String,
                     enCol: String, idCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeIntervals: at least one key column " +
      "(a keyless merge would move every interval to one partition)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(stCol), col(idCol))
    // malformed intervals (end < start) refuse LOUDLY, matching the
    // intervalOverlapJoin contract — a negative-length interval in the
    // running-max chain would silently corrupt island boundaries. The
    // check rides INSIDE the island aggregation's max(en) (every input
    // row flows through it, including single-interval islands; a
    // separate never-read check column would be pruned and skip the
    // raise), cast back to the column's own type.
    val enType = df.schema(enCol).dataType.sql
    val checkedEn = expr(
      s"CASE WHEN $enCol < $stCol THEN CAST(raise_error(" +
        s"'mergeIntervals: interval end before start') AS $enType) " +
        s"ELSE $enCol END")
    df.withColumn("_pmax", max(col(enCol)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_brk",
        when(col("_pmax").isNull || col(stCol) > col("_pmax"), 1L).otherwise(0L))
      .withColumn("island", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("island"): _*)
      .agg(min(col(stCol)).as("start_us"), max(checkedEn).as("end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("covered_us", col("end_us") - col("start_us"))
  }
}

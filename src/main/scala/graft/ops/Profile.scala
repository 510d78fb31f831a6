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

  /** EXACT two-sample Kolmogorov–Smirnov drift test, each group vs the
    * rest of the corpus, over an integer-valued column — the
    * distribution-shape alarm next to [[graft.classify.TextClassify
    * .tokenDrift]]'s token-mix TVD: a source whose LENGTH distribution
    * diverges (truncation, boilerplate, a changed extractor upstream)
    * trips KS even when its token mix looks normal.
    *
    * Exactness: the KS statistic sup|F_g − F_rest| is reported as an
    * integer NUMERATOR on the common denominator n_g·n_rest —
    * ks_num = max over thresholds of
    * |cum_g·n_rest − cum_rest·n_g| — pure integer products and sums,
    * bit-identical on any engine (readers divide by n_g·n_rest for
    * the statistic; √-based p-values are a client-side lookup).
    * `ks_at` is the threshold value where the divergence peaks
    * (smallest such value on ties — deterministic).
    *
    * Scale shape: one (group, value) count aggregation (map-side
    * partial) collapses the corpus; everything after runs on the
    * GRID frame — |groups| × |distinct values| rows (sources ×
    * lengths: thousands) — where per-group windows and the one
    * value-ordered global cumsum are bounded by the grid, never the
    * corpus. Products are ≤ N², guarded in-plan to N ≤ 3·10⁹ (the
    * int64 bound), with the DECIMAL escape hatch documented.
    */
  def ksDriftByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val base = df.select(col(groupCol).as("grp"), v.as("val"))
    val counts = graft.util.CacheScope.pin(
      base.groupBy(col("grp"), col("val")).agg(count(lit(1)).as("cnt")))
    val dl = counts.select(col("val")).distinct()
    val grps = counts.groupBy(col("grp")).agg(sum(col("cnt")).as("n_g"))
    val nAll = counts.agg(sum(col("cnt")).as("n_all"))
    val grid = grps.crossJoin(dl)
      .join(counts, Seq("grp", "val"), "left").na.fill(0L, Seq("cnt"))
    val cumG = grid.withColumn("cum_g",
      sum(col("cnt")).over(Window.partitionBy(col("grp")).orderBy(col("val"))))
    // the global cumsum runs on the DISTINCT-VALUE frame (value-bounded,
    // corpus-independent) — a deliberate bounded single-task window,
    // like the corpus-stats 1-row aggregates
    val cumAll = counts.groupBy(col("val")).agg(sum(col("cnt")).as("c"))
      .withColumn("cum_all", sum(col("c")).over(Window.orderBy(col("val"))))
      .select(col("val"), col("cum_all"))
    val scored = cumG.join(cumAll, "val").crossJoin(broadcast(nAll))
      .filter(assert_true(col("n_all") <= lit(3000000000L),
        lit("ksDriftByGroup: corpus rows exceed 3e9 — the cum·n " +
          "products pass int64; cross-multiply in DECIMAL(38,0) for " +
          "corpora this large")).isNull)
      .withColumn("diff",
        abs(col("cum_g") * (col("n_all") - col("n_g")) -
          (col("cum_all") - col("cum_g")) * col("n_g")))
    val w = Window.partitionBy(col("grp")).orderBy(col("diff").desc, col("val"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("grp").as(groupCol), col("n_g").as("n_group"),
        (col("n_all") - col("n_g")).as("n_rest"),
        col("diff").as("ks_num"), col("val").as("ks_at"))
  }

  /** Join-key skew profile — the pre-flight audit run BEFORE shuffling
    * 100 TB on `keyCol`: the top-`topK` heavy-hitter keys with their
    * row share, plus the exact Gini coefficient of the whole key
    * distribution (0 = uniform, →1 = one key owns the table), both in
    * ppm. A key whose `share_ppm` ≫ 10⁶/numPartitions is the one that
    * melts a reducer and wants [[graft.operators.Salting]] or AQE skew
    * handling; the Gini says whether it's one celebrity or a heavy
    * tail. Ranks ride [[graft.operators.Ranking.globalRowNumber]]
    * (range-partitioned — no single-task global window), and
    * Gini = (2·Σr·c − (n+1)·Σc)·10⁶ div (n·Σc) with the rank-count
    * cross products in DECIMAL(38,0): exact integer arithmetic at any
    * corpus size, bit-identical on any engine/shuffle order.
    *
    * Output: (rank, key, cnt, share_ppm, n_keys, gini_ppm), one row
    * per heavy hitter, ordered by rank.
    */
  /** Exact join-cardinality prediction — [[keySkewProfile]]'s sibling
    * and the other pre-flight audit run BEFORE a 100-TB join: the
    * EXACT output row count of `a ⋈ b` on an equi-key
    * (Σ_k cntA(k)·cntB(k) — two count aggregations and a vocab-grain
    * join, never the join itself), the worst single key's output
    * (the row count ONE reducer will emit — the "will this join
    * explode" number AQE can only react to after the fact), and the
    * top-`topK` contributing keys. Counts multiply in DECIMAL(38,0)
    * and the total ships hi/lo-split (the q_spearman_signals idiom) —
    * exact at any corpus size.
    *
    * Output: (rank, key, cnt_a, cnt_b, out_rows, out_total_hi,
    * out_total_lo, n_join_keys), one row per top contributor by
    * (out_rows desc, key asc).
    */
  def joinCardinality(a: DataFrame, b: DataFrame, keyA: String, keyB: String,
                      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"joinCardinality needs topK >= 1, got $topK")
    val ca = a.groupBy(col(keyA).as("k")).agg(count(lit(1)).as("cnt_a"))
    val cb = b.groupBy(col(keyB).as("k")).agg(count(lit(1)).as("cnt_b"))
    val per = graft.util.CacheScope.pin(
      ca.join(cb, "k")
        .select(col("k"), col("cnt_a"), col("cnt_b"),
          (col("cnt_a").cast("decimal(19,0)") * col("cnt_b")).as("_out")))
    val tot = per.agg(count(lit(1)).as("n_join_keys"), sum(col("_out")).as("_t"))
      .select(col("n_join_keys"),
        expr("cast(_t div 1000000000000000000 as long)").as("out_total_hi"),
        expr("cast(_t % 1000000000000000000 as long)").as("out_total_lo"))
    graft.operators.Ranking.globalRowNumber(per,
        Seq(col("_out").desc, col("k").asc), out = "rank")
      .filter(col("rank") <= topK)
      // a single key above int64 output rows means the join is
      // infeasible outright — fail loud rather than overflow silently
      .filter(assert_true(col("_out") <= lit(Long.MaxValue),
        lit("joinCardinality: a single key's output exceeds int64 rows — " +
          "the join is infeasible as keyed")).isNull)
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("k"), col("cnt_a"), col("cnt_b"),
        col("_out").cast("long").as("out_rows"),
        col("out_total_hi"), col("out_total_lo"), col("n_join_keys"))
      .orderBy(col("rank"))
  }

  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"keySkewProfile needs topK >= 1, got $topK")
    val counts = graft.util.CacheScope.pin(
      df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt")))
    val ranked = graft.operators.Ranking.globalRowNumber(counts,
      Seq(col("cnt").asc, col(keyCol).asc), out = "r")
    val stats = ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt").cast("decimal(38,0)")).as("s"),
      sum(expr("cast(r as decimal(38,0)) * cnt")).as("s1"))
      .select(col("n_keys"), col("s"),
        expr("cast((2 * s1 - (n_keys + 1) * s) * 1000000 div (n_keys * s) as bigint)")
          .as("gini_ppm"))
    val top = graft.operators.Ranking.globalRowNumber(counts,
      Seq(col("cnt").desc, col(keyCol).asc), out = "rank")
      .filter(col("rank") <= topK)
    top.crossJoin(broadcast(stats))
      .select(col("rank"), col(keyCol), col("cnt"),
        expr("cast(cast(cnt as decimal(38,0)) * 1000000 div s as bigint)")
          .as("share_ppm"),
        col("n_keys"), col("gini_ppm"))
      .orderBy(col("rank"))
  }
}

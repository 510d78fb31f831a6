package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Ranking

/** Deterministic corpus-sampling operators beyond the flat hash gates
  * in the query surface (`q_hash_sample`/`q_mix_sample`/`q_temp_mix`):
  * weight-proportional selection and curriculum ordering. Everything
  * is seedless-deterministic (md5-derived pseudo-randomness keyed on
  * the row id), so reruns and engines agree row-for-row — the
  * reproducibility contract every training-data cut needs.
  */
object Sampling {

  /** Deterministic weighted sampling WITHOUT replacement, k rows per
    * group — the Efraimidis–Spirakis A-ES one-pass scheme: each row
    * draws u ∈ (0,1] from a hash of its id and is ranked by
    * u^(1/w) — equivalently by key = ln(u)/w descending — and the
    * top-k per group win. Selection probability is proportional to
    * `weightCol` (truncated at 1), the standard weighted-reservoir
    * semantics, but with hash-derived u the draw is reproducible on
    * any engine with md5.
    *
    * Exactness: u = (h48+1)/2^48 is an exact double (the divisor is a
    * power of two); ln is rounded to 9 decimals (the repo-wide
    * cross-engine log contract, see [[graft.classify.TextClassify]])
    * before the single IEEE division by the weight; ties (possible
    * only at the 1e-9 rounding grain) break on the row id.
    *
    * Scale shape: map-side key computation + ONE partitioned window
    * (shuffle on `groupCol`) — never a global window; with G groups
    * and balanced sources the sort is (n/G)·log per partition. Rows
    * with NULL or non-positive weight never qualify.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, weightCol: String,
                             idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"weightedSamplePerGroup needs k >= 1, got $k")
    val w = col(weightCol).cast("double")
    val u = (TextFns.hash48(col(idCol).cast("string")) + 1).cast("double") /
      lit(281474976710656.0) // 2^48
    val key = round(log(u), 9) / w
    val rn = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(key.desc, col(idCol)))
    df.filter(w > 0.0)
      .withColumn("samp_rank", rn.cast("long"))
      .filter(col("samp_rank") <= k)
  }

  /** Deterministic BOUNDED sample: the `cap` rows with the lowest
    * (md5-derived hash, id) key — the absolute-count companion of the
    * rate-based md5-bucket gates (`q_hash_sample`). A fixed RATE
    * sample grows with the corpus, so any downstream pair join or
    * per-sample scan grows with it (quadratically for pairs); a fixed
    * CAP pins that work regardless of corpus size — the only sample
    * shape an O(sample²) audit may take at 100 TB. Selection is
    * seedless-deterministic (hash of the id, ties on the id), so
    * reruns, engines, and partitionings agree row-for-row, and the
    * plan is a TakeOrderedAndProject (per-partition top-cap, then a
    * cap-bounded merge) — never a global sort.
    */
  def hashCapSample(df: DataFrame, idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"hashCapSample needs cap >= 1, got $cap")
    df.orderBy(TextFns.hash48(col(idCol).cast("string")), col(idCol)).limit(cap)
  }

  /** Curriculum ordering: bucket the corpus into `tiles` difficulty
    * tiers (exact global ntile over `difficultyCol` — easy tiers
    * first), then interleave sources round-robin WITHIN each tier so
    * no difficulty band is dominated by one source — the
    * easy-to-hard + source-balanced feed order curriculum-training
    * recipes prescribe. Emits the tier, the within-(tier,group)
    * round-robin rank, and the exact global curriculum position.
    *
    * Scale shape: tier assignment via [[Ranking.globalNtile]]
    * (range-partitioned, no single-task window); the round-robin rank
    * is one partitioned window on (tier, group); the final position is
    * a second [[Ranking.globalRowNumber]] over (tier, rank, group) —
    * three bounded shuffles total, each on well-spread keys.
    */
  def curriculumInterleave(df: DataFrame, difficultyCol: String, groupCol: String,
                           idCol: String, tiles: Int = 10): DataFrame = {
    val tiered = Ranking.globalNtile(
      df, tiles, Seq(col(difficultyCol), col(idCol)), out = "tier")
    val rr = tiered.withColumn("rr_rank", row_number().over(
      Window.partitionBy(col("tier"), col(groupCol))
        .orderBy(col(difficultyCol), col(idCol))).cast("long"))
    Ranking.globalRowNumber(
      rr, Seq(col("tier"), col("rr_rank"), col(groupCol), col(idCol)),
      out = "curriculum_pos")
  }

  /** Exact integer water-filling: allocate a total budget of
    * B = total·`num` div `den` rows across groups so no group exceeds
    * a common level τ — the "cap the big sources to hit a token
    * budget" data-mix step (big sources are cut to the level, small
    * sources keep everything; the standard proportional-fairness
    * allocation). `counts` is one row per group: (`groupCol`,
    * `nCol` integer availability).
    *
    * Exact semantics (integer end-to-end, no floats anywhere):
    * sort groups by (n asc, group asc); the pivot k* is the first
    * rank where capping every later group at its own n reaches B;
    * τ = (B − prefix(k*−1)) div |uncapped|, and the remainder goes
    * +1 each to the first r uncapped groups by group name. When
    * B ≥ total every group keeps its full n.
    *
    * Scale note: the windows here run over the GROUP-COUNT frame
    * (sources/domains — thousands of rows at most), not the corpus;
    * a single-partition window over that frame is deliberate and
    * harmless, the same shape as the 1-row corpus-stats aggregates.
    */
  def waterFill(counts: DataFrame, groupCol: String, nCol: String,
                num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0, s"waterFill needs num >= 0, den > 0; got $num/$den")
    val n = col(nCol).cast("long")
    val w = Window.orderBy(n, col(groupCol))
    val tot = counts.agg(sum(n).as("_total"),
        count(lit(1)).cast("long").as("_s"))
      // product in DECIMAL(38,0): total·num overflows Long once total
      // reaches 2^63/num (a 2^53-token corpus with num in the hundreds
      // already would) — the decimal product stays exact and `div`
      // brings the budget back to BIGINT
      .withColumn("_b",
        expr(s"cast(_total as decimal(38,0)) * ${num}L div ${den}L"))
    val ranked = counts
      .withColumn("_k", row_number().over(w).cast("long"))
      .withColumn("_cum", sum(n).over(w))
      .crossJoin(broadcast(tot))
    // first rank where full-prefix + level-capped-suffix reaches B
    val pivot = ranked
      .filter(col("_cum") + (col("_s") - col("_k")) * n >= col("_b"))
      .orderBy(col("_k")).limit(1)
      .agg(min(col("_k")).as("_kstar"),
        min(col("_cum") - n).as("_prefix"),
        min(col("_s") - col("_k") + 1).as("_cnt")) // 1 row; NULLs when B >= total
    val joined = ranked.crossJoin(broadcast(pivot))
      .withColumn("_d", col("_b") - col("_prefix"))
      // `div`, not `/`: Divide(long, long) returns DOUBLE, which
      // rounds for budgets ≥ 2^53 (token-count budgets reach that) —
      // the integer contract must hold end-to-end
      .withColumn("_tau", expr("_d div _cnt"))
      .withColumn("_r", pmod(col("_d"), col("_cnt")))
    val uncapped = joined.filter(col("_k") >= col("_kstar"))
      .withColumn("_r2", row_number().over(Window.orderBy(col(groupCol))).cast("long"))
      .withColumn("alloc",
        col("_tau") + when(col("_r2") <= col("_r"), 1L).otherwise(0L))
    val capped = joined.filter(col("_kstar").isNull || col("_k") < col("_kstar"))
      .withColumn("alloc", n)
    capped.select(col(groupCol), n.as("n_avail"), col("alloc"))
      .unionByName(uncapped.select(col(groupCol), n.as("n_avail"), col("alloc")))
  }

  /** Embedding-cluster balanced sampling — the embedding-space twin of
    * source mixing: assign every vector to its nearest centroid
    * ([[graft.sim.Similarity.assignToCentroids]] — cosine argmax
    * against a broadcast centroid set), then [[waterFill]] a
    * `num`/`den` budget across the CLUSTERS so no topic exceeds a
    * common level — over-represented regions of embedding space are
    * cut to the water line, sparse topics keep everything. Admission
    * within a cluster is deterministic lowest-id-first (`rank <=
    * alloc`), so reruns and engines agree row-for-row.
    *
    * Output: one row per corpus vector — (id, centroid_id, sim, rank,
    * alloc, keep).
    *
    * Scale shape: the corpus never shuffles for the assignment
    * (broadcast centroids, map-side argmax); the water-fill runs on
    * the k-row cluster-count frame; the admission rank is one
    * shuffle on centroid_id (k partitions — same accepted shape as
    * the per-source cap; for k in the tens with a 100 TB corpus,
    * rank on (centroid_id, salted sub-rank) or
    * [[graft.operators.Ranking.globalRowNumber]] per cluster instead).
    * Pair with [[graft.sim.Similarity.kmeansFit]] for learned
    * centroids; any fixed centroid frame (e.g. a curated probe set)
    * works and keeps the decision oracle-exact.
    */
  def clusterBalance(corpus: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String,
                     num: Long, den: Long): DataFrame = {
    val assigned = graft.sim.Similarity
      .assignToCentroids(corpus, centroids, idCol, vecCol)
      .select(col("id"), col("centroid_id"), col("sim"))
    val counts = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n"))
    val alloc = waterFill(counts, "centroid_id", "n", num, den)
    val w = Window.partitionBy(col("centroid_id")).orderBy(col("id"))
    assigned
      .withColumn("rank", row_number().over(w).cast("long"))
      .join(broadcast(alloc.select(col("centroid_id"), col("alloc"))),
        "centroid_id")
      .withColumn("keep", col("rank") <= col("alloc"))
      .select(col("id"), col("centroid_id"), col("sim"), col("rank"),
        col("alloc"), col("keep"))
  }
}

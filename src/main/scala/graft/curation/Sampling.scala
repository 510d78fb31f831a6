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
      .withColumn("_es_key", key)
      .withColumn("samp_rank", rn.cast("long"))
      .filter(col("samp_rank") <= k)
      .drop("_es_key")
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
}

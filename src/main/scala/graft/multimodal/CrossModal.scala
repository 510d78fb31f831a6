package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-modal pair dedup — the document-level combiner the three
  * per-modality families feed: real multimodal corpora dedup (text,
  * image) PAIRS, and the interesting duplicates are exactly the ones
  * NEITHER side catches alone — a caption-tweaked re-upload whose text
  * similarity is below the text-only threshold AND whose re-encoded
  * image is a few hash bits off. The policy is the standard two-lever
  * gate:
  *
  *   - `dup_or`  — either modality crosses its STRICT single-modality
  *     threshold (the per-modality dedup decision, unchanged);
  *   - `dup_and` — BOTH modalities cross their LOOSE thresholds: weak
  *     agreement across independent signals, the cross-modal catch.
  *
  * Inputs are the per-modality candidate-pair frames (`id_a`, `id_b`,
  * measure), already blocked by their own scale machinery: text pairs
  * from the shared-shingle inverted index
  * ([[graft.dedup.Dedup.jaccardPairs]], recall 1 for any pair with a
  * positive Jaccard) pre-filtered at the loose threshold, image pairs
  * from the hamming-banded join
  * ([[graft.multimodal.ImagePhash.nearDupPairs]], recall 1 by the
  * pigeonhole bound) at the loose hamming. A pair absent from a frame
  * contributes `false` to that modality's tests (NULL-safe).
  *
  * Scale shape: one full-outer equi-join of two collision-bounded pair
  * frames on the (id_a, id_b) pair key — work ∝ candidates, never
  * corpus²; no new all-pairs surface is introduced by the combine.
  *
  * Reference analog: none — the reference has no media dedup in any
  * form; beyond-parity multimodal curation family.
  */
object CrossModal {

  /** Combine text and image candidate pairs under the AND/OR policy.
    * Output: (id_a, id_b, jaccard, hamming, dup_and, dup_or), only
    * pairs where at least one policy fires. `jaccard`/`hamming` are
    * NULL when the pair is absent from that modality's candidates.
    */
  def pairPolicy(textPairs: DataFrame, imagePairs: DataFrame,
                 textStrict: Double, textLoose: Double,
                 imgStrict: Int, imgLoose: Int): DataFrame = {
    require(textLoose <= textStrict,
      s"textLoose ($textLoose) must be <= textStrict ($textStrict)")
    require(imgStrict <= imgLoose,
      s"imgStrict ($imgStrict) must be <= imgLoose ($imgLoose)")
    val t = textPairs.select(col("id_a"), col("id_b"), col("jaccard"))
    val i = imagePairs.select(col("id_a"), col("id_b"), col("hamming"))
    t.join(i, Seq("id_a", "id_b"), "full_outer")
      .withColumn("dup_and",
        coalesce(col("jaccard") >= textLoose, lit(false)) &&
          coalesce(col("hamming") <= imgLoose, lit(false)))
      .withColumn("dup_or",
        coalesce(col("jaccard") >= textStrict, lit(false)) ||
          coalesce(col("hamming") <= imgStrict, lit(false)))
      .filter(col("dup_and") || col("dup_or"))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("hamming"),
        col("dup_and"), col("dup_or"))
  }
}

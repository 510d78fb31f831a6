package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor / similarity-search operators over an
  * embedding column.
  *
  * Scale design: the brute-force path broadcasts the (small) query
  * set against the (huge) corpus — a map-only scan, no corpus
  * shuffle — and ranks inside a per-query window. The IVF-style path
  * first assigns the corpus to centroids (broadcast again), then only
  * probes the matching cell: the corpus is read once, partitioned by
  * cell, and each query touches 1/k of it.
  */
object Similarity {

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); `corpus` can be huge.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sims = c.join(broadcast(q), col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        VectorFns.cosineR(col("q_vec"), col("vec")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Hard-negative mining for contrastive training: each query's
    * top-k most-similar corpus items strictly BELOW a near-dup
    * `ceiling` — the "similar but not a duplicate" band that makes
    * informative negatives. At or above the ceiling a candidate is
    * presumed a positive/near-duplicate of the query and excluded:
    * feeding those as negatives poisons the contrastive objective
    * (the false-negative hazard SimCLR/DPR training guards against).
    *
    * Brute-scan baseline with the [[bruteForceTopK]] shape (query
    * side broadcast, corpus never shuffles, one per-query window over
    * the candidate rows). At corpus scale swap the candidate
    * generator for [[ivfSq8TopK]] with a larger k and apply the same
    * ceiling filter — identical surface, sub-linear probe cost.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, ceiling: Double): DataFrame = {
    require(ceiling > -1.0 && ceiling <= 1.0,
      s"hardNegatives: ceiling must be a cosine in (-1, 1], got $ceiling")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sims = c.join(broadcast(q), col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        VectorFns.cosineR(col("q_vec"), col("vec")).as("sim"))
      .filter(col("sim") < ceiling)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** IVF-style cell assignment: nearest centroid (by cosine) per
    * corpus vector. Centroids are broadcast; output carries the cell
    * id so a downstream search only probes one cell per query.
    */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
                        idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val z = centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(z))
      .select(col("id"), col("centroid_id"),
        VectorFns.cosineR(col("vec"), col("c_vec")).as("sim"))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("centroid_id"), col("sim"))
  }

  /** Cell assignment keeping the vector column — the probe-side shape
    * of IVF search (corpus partitioned by cell, vectors in place).
    * `keep` > 1 assigns the row to its `keep` nearest cells (the
    * query-side multi-probe of IVF).
    */
  private[graft] def assignCells(df: DataFrame, centroids: DataFrame,
                          idCol: String, vecCol: String,
                          outId: String, outVec: String,
                          keep: Int = 1): DataFrame = {
    val c = df.select(col(idCol).as(outId), col(vecCol).as(outVec))
    val z = centroids.select(col(idCol).as("cell"), col(vecCol).as("c_vec"))
    val scored = c.join(broadcast(z))
      .select(col(outId), col(outVec), col("cell"),
        VectorFns.cosineR(col(outVec), col("c_vec")).as("c_sim"))
    val w = Window.partitionBy(col(outId)).orderBy(col("c_sim").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= keep)
      .select(col(outId), col(outVec), col("cell"))
  }

  /** IVF probe search: the corpus is assigned to centroid cells once
    * (broadcast centroids, map-only), then each query scans only its
    * `nprobe` nearest centroids' cells — an equi-join on the cell id,
    * so a query touches nprobe·|corpus|/|centroids| rows instead of
    * the whole corpus. `nprobe` is the standard IVF recall lever: a
    * true neighbor assigned to an adjacent cell is invisible at
    * nprobe=1 and found again at nprobe>=2, at linear probe cost. A
    * corpus row lives in exactly one cell, so a (query, row) pair is
    * scored at most once regardless of nprobe. The queries frame must
    * be small (it is broadcast).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    val sims = ivfCandidates(queries, corpus, centroids, idCol, vecCol, nprobe)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** The (q_id, id, sim) frame an IVF probe at `nprobe` actually
    * scans — [[ivfTopK]] is its top-k ranking. Exposed so recall/cost
    * sweeps can count the scan (the quantity that prices a probe
    * setting at corpus scale) without re-deriving the internals; each
    * corpus vector lives in exactly one cell, so a (query, candidate)
    * pair appears at most once regardless of nprobe. */
  def ivfCandidates(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                    idCol: String, vecCol: String, nprobe: Int = 1): DataFrame =
    ivfCandidatesFromCells(queries,
      ivfCells(corpus, centroids, idCol, vecCol), centroids, idCol, vecCol, nprobe)

  /** The corpus-side cell assignment — nprobe-INDEPENDENT, so sweeps
    * over probe settings compute (and pin) it once instead of paying
    * the |corpus| × |centroids| assignment per setting. Rows are
    * (id, vec, cell), the frame [[ivfCandidatesFromCells]] probes. */
  def ivfCells(corpus: DataFrame, centroids: DataFrame,
               idCol: String, vecCol: String): DataFrame =
    assignCells(corpus, centroids, idCol, vecCol, "id", "vec")

  /** [[ivfCandidates]] over a precomputed [[ivfCells]] frame — only
    * the query-side assignment (tiny) varies with nprobe. */
  def ivfCandidatesFromCells(queries: DataFrame, cells: DataFrame, centroids: DataFrame,
                             idCol: String, vecCol: String, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val qc = assignCells(queries, centroids, idCol, vecCol, "q_id", "q_vec", keep = nprobe)
    cells.join(broadcast(qc), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"), VectorFns.cosineR(col("q_vec"), col("vec")).as("sim"))
  }

  /** Train IVF centroids with Lloyd's k-means: deterministic init (the
    * k lowest-id vectors), then `iters` rounds of broadcast-centroid
    * assignment + per-dimension mean. The mean is computed by
    * posexplode → groupBy(cell, dim) — a partial-aggregated shuffle of
    * n·d scalars, never a collect_list of vectors — so a round costs
    * one broadcast join and one agg shuffle regardless of corpus size.
    * Lineage is cut per round (localCheckpoint): the plan stays O(1)
    * deep instead of O(iters).
    *
    * Returns (centroid_id, vec, n_members) for the final round.
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int = 3): DataFrame = {
    require(iters >= 1, "kmeansFit needs at least one Lloyd round")
    // a centroid that loses every member drops out (its cell produces
    // no mean) — callers needing exactly k cells re-seed, as usual
    // every Lloyd round re-reads the corpus — materialize it once
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<float>").as("vec"))
      .cache()
    // the unpartitioned window runs AFTER limit(k): it renumbers at
    // most k seed rows (k ≪ corpus), so the single-partition sort the
    // planner warns about is bounded by k, not the corpus
    val w = Window.orderBy(col("id"))
    var centroids = c.orderBy(col("id")).limit(k)
      .withColumn("id", row_number().over(w).cast("long"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assignCells(c, centroids, "id", "vec", "id", "vec")
      centroids = assigned
        .select(col("cell"), posexplode(col("vec")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).as("m"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"),
          first(col("n")).as("n_members"))
        .select(col("cell").as("id"),
          expr("transform(pm, x -> cast(x.m as float))").as("vec"),
          col("n_members"))
        .localCheckpoint()
    }
    val out = centroids.select(col("id").as("centroid_id"), col("vec"), col("n_members"))
      .localCheckpoint()
    c.unpersist()
    out
  }

  /** Signed-random-projection LSH: bucket vectors by the sign pattern
    * of `nPlanes` hyperplane dot products, then search only within the
    * query's bucket. Planes are derived deterministically (md5-seeded
    * values per (plane, dim)), so signatures are reproducible across
    * runs and engines.
    *
    * The scale path for ANN: candidate generation is an equi-join on
    * the bucket key (one shuffle), recall is tunable via nPlanes
    * (fewer planes → bigger buckets → higher recall, more compute).
    */
  /** Deterministic pseudo-random hyperplanes in [-0.5, 0.5), one set
    * per table (multi-table LSH: recall ≈ 1-(1-p^bits)^tables).
    */
  private def srpPlane(t: Int, p: Int, dim: Int): Array[Float] = Array.tabulate(dim) { i =>
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"table-$t-plane-$p-dim-$i".getBytes("UTF-8"))
    (java.lang.Byte.toUnsignedInt(h(0)) * 256 + java.lang.Byte.toUnsignedInt(h(1))) / 65536.0f - 0.5f
  }

  private def srpSignature(t: Int, vec: Column, bitsPerTable: Int, dim: Int): Column =
    (0 until bitsPerTable).map { p =>
      val planeCol = array(srpPlane(t, p, dim).toIndexedSeq.map(v => lit(v)): _*).cast("array<float>")
      when(VectorFns.dot(planeCol, vec) >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _) + lit(t.toLong << 32) // disjoint bucket space per table

  private def srpBucketed(df: DataFrame, id: String, vec: String,
                          nTables: Int, bitsPerTable: Int, dim: Int): DataFrame =
    df.select(col(id), col(vec),
      explode(array((0 until nTables).map(t =>
        srpSignature(t, col(vec), bitsPerTable, dim)): _*)).as("bucket"))

  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nTables: Int = 8, bitsPerTable: Int = 4, dim: Int = 64): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      srpBucketed(df, id, vec, nTables, bitsPerTable, dim)

    val c = bucketed(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")), "id", "vec")
    val q = bucketed(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")), "q_id", "q_vec")
    val candidates = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("q_vec"), col("id"), col("vec"))
      .dropDuplicates("q_id", "id")
    val sims = candidates
      .select(col("q_id"), col("id"), VectorFns.cosineR(col("q_vec"), col("vec")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Scalar int8 quantization of an embedding column: per-vector
    * max-abs scale, `codes[i] = floor(x[i]·127/scale + 0.5)` in
    * [-127, 127] stored as TINYINT — 4× smaller than FP32, the
    * standard memory/IO-compression step before a 100 TB-scale vector
    * index (a 64-dim corpus drops from 256 B to 64 B + 8 B scale per
    * row, so 4× more of the index fits in executor memory or a
    * broadcast). Map-only, no shuffle. Output: (`idCol`, `sq8_scale`
    * DOUBLE, `sq8_codes` ARRAY<TINYINT>); dequantize as
    * `code·scale/127`. A zero vector encodes as scale 0, codes all 0.
    *
    * Every arithmetic step (promote to double, ·127, /scale, +0.5,
    * floor) is a correctly-rounded IEEE op, so codes are
    * bit-reproducible across engines — the DuckDB oracle re-derives
    * them exactly.
    */
  def sq8Encode(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // Degenerate inputs get explicit semantics instead of engine-specific
    // float quirks: an empty embedding encodes as scale 0 / empty codes
    // (array_max of [] is NULL → coalesced), and a vector containing NaN
    // encodes as NULL scale / NULL codes (excluded from the index) —
    // Spark's floor(NaN) would silently yield code 0 where DuckDB
    // propagates NaN, so NaN vectors must not reach the quantizer.
    val rawScale = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol),
        col(vecCol),
        when(isnan(rawScale), lit(null).cast("double"))
          .otherwise(coalesce(rawScale, lit(0d))).as("sq8_scale"))
      .select(col(idCol), col("sq8_scale"),
        when(col("sq8_scale").isNull, lit(null))
          .when(col("sq8_scale") === 0d, transform(col(vecCol), _ => lit(0L)))
          .otherwise(transform(col(vecCol),
            x => floor(x.cast("double") * lit(127.0) / col("sq8_scale") + lit(0.5))))
          .cast("array<tinyint>").as("sq8_codes"))
  }

  /** Brute-force top-k cosine over SQ8 codes — approximate ANN on the
    * quantized index. Cosine is scale-invariant, so ranking on the raw
    * int codes equals ranking on the dequantized vectors; the only
    * error vs FP32 search is the per-dimension rounding (≤ scale/254),
    * which preserves top-k order for all but near-tied neighbors.
    * Same plan shape as [[bruteForceTopK]]: queries broadcast, corpus
    * scanned map-only — but the scanned index is 4× smaller.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    // tinyint→float is exact (|code| <= 127), so the double-precision
    // cosine over the cast codes is deterministic
    // NaN-containing vectors encode as NULL codes ([[sq8Encode]]) and
    // are EXCLUDED from the index and the query set — they would
    // otherwise ride along as NULL-sim rows in the ranking
    def codesOf(df: DataFrame, outId: String, outVec: String): DataFrame =
      sq8Encode(df, idCol, vecCol)
        .select(col(idCol).as(outId), col("sq8_codes").cast("array<float>").as(outVec))
        .filter(col(outVec).isNotNull)
    val c = codesOf(corpus, "id", "vec")
    val q = codesOf(queries, "q_id", "q_vec")
    val sims = c.join(broadcast(q), col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        VectorFns.cosineR(col("q_vec"), col("vec")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** IVF probe over the SQ8-quantized index — the production ANN
    * memory shape: cells are assigned ONCE on the original fp32
    * vectors (broadcast centroids, map-only), but the probe scans
    * int8 CODES — 4× less index memory and scan I/O than fp32, which
    * at 100 TB is the difference between an in-memory index and a
    * spilling one. Ranking compares code cosines (every quantization
    * step is a correctly-rounded IEEE op, so code ranking is
    * engine-exact — the [[sq8TopK]] contract) over only the nprobe
    * matched cells' rows ([[ivfTopK]]'s probe shape). NaN-containing
    * vectors encode as NULL codes and are excluded from the index and
    * the query set, exactly like [[sq8TopK]].
    */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                 idCol: String, vecCol: String, k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    def codesOf(df: DataFrame, outId: String, outVec: String): DataFrame =
      sq8Encode(df, idCol, vecCol)
        .select(col(idCol).as(outId), col("sq8_codes").cast("array<float>").as(outVec))
        .filter(col(outVec).isNotNull)
    val indexed = ivfCells(corpus, centroids, idCol, vecCol)
      .select(col("id"), col("cell"))
      .join(codesOf(corpus, "id", "cvec"), "id")
    val qc = assignCells(queries, centroids, idCol, vecCol, "q_id", "q_vec", keep = nprobe)
      .select(col("q_id"), col("cell"))
      .join(codesOf(queries, "q_id", "qvec"), "q_id")
    val sims = indexed.join(broadcast(qc), Seq("cell"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        VectorFns.cosineR(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Cluster-level SEMANTIC dedup (the SemDeDup recipe, Abbas et al.
    * 2023, arXiv:2303.09540): assign every vector to its nearest
    * centroid cell ONCE (broadcast centroids, map-only), then compare
    * SQ8 code cosines WITHIN each cell only and drop the higher id of
    * any pair at or above `simThreshold` — semantic near-duplicates
    * live in the same cluster by construction, so the O(n²) pair space
    * collapses to Σ_cell m² (at k ≈ √n cells, O(n^1.5) total, each
    * cell's pairs a self-contained equi-join partition — the published
    * recipe's reason for clustering first). Min-id-wins pairwise, the
    * dedup family's convention; chains (A≈B≈C with A<B<C) drop B and C
    * both — [[graft.dedup.Dedup.resolveDropTargets]] reconstructs
    * transitive keepers when needed.
    *
    * Returns one row per non-NaN corpus vector: (id, cell, keep,
    * dropped_for) with `dropped_for` = the SMALLEST same-cell neighbor
    * at/above threshold below the id (NULL ⇒ kept). Cosines compare on
    * the SQ8 codes ([[sq8Encode]] — every step correctly rounded, so
    * the frame replays bit-identically on any engine).
    */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame,
                    idCol: String, vecCol: String,
                    simThreshold: Double): DataFrame = {
    val coded = graft.util.CacheScope.pin(
      ivfCells(corpus, centroids, idCol, vecCol)
        .select(col("id"), col("cell"))
        .join(sq8Encode(corpus, idCol, vecCol)
          .select(col(idCol).as("id"),
            col("sq8_codes").cast("array<float>").as("cvec"))
          .filter(col("cvec").isNotNull), "id"))
    val drops = coded.as("a").join(coded.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(VectorFns.cosineR(col("a.cvec"), col("b.cvec")) >= simThreshold)
      .groupBy(col("b.id").as("id"))
      .agg(min(col("a.id")).as("dropped_for"))
    coded.select(col("id"), col("cell"))
      .join(drops, Seq("id"), "left")
      .select(col("id"), col("cell"),
        col("dropped_for").isNull.as("keep"), col("dropped_for"))
  }

  /** Near-dup pairs via LSH blocking — the scale path: candidates are
    * pairs sharing any SRP bucket (near-identical vectors share ALL
    * buckets, so recall at high thresholds ≈ 1), verified by exact
    * cosine. Work ∝ bucket collisions, not |corpus|².
    */
  def nearDupPairsLSH(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double,
                      nTables: Int = 8, bitsPerTable: Int = 4, dim: Int = 64): DataFrame = {
    val b = srpBucketed(corpus.select(col(idCol).as("id"), col(vecCol).as("vec")),
      "id", "vec", nTables, bitsPerTable, dim)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("a.vec").as("va"),
        col("b.id").as("vec_b"), col("b.vec").as("vb"))
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"), VectorFns.cosineR(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding near-duplicate pairs above a cosine threshold.
    * Correctness-scale implementation is the exact all-pairs join;
    * at 100 TB [[nearDupPairsLSH]] bounds the pair set.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("vec_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("vec_b"), col(vecCol).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), VectorFns.cosineR(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Mutual nearest-neighbor pairs — the bitext-mining / semantic-
    * pairing primitive: (a, b) qualifies iff b is a's single nearest
    * neighbor AND a is b's (cosine desc, id asc — a total order, so
    * the pairing replays identically on any engine). Mutuality is the
    * classic precision filter over one-directional NN: a hubby vector
    * that is "nearest" to half the corpus almost never gets them back.
    *
    * `candidates` plugs in the scale path: any (q_id, id, sim) frame —
    * [[ivfCandidatesFromCells]] over a persistent index, or an SRP-
    * bucketed pair frame — bounds the search to collisions, making
    * this ANN-mutual (exact on any pair the candidate generator
    * recalls). Default is the exact all-pairs join, the oracle
    * baseline at correctness scale. The NN argmax is one map-side-
    * combinable min(struct(-sim, id)) per side; the mutuality check is
    * a self-join on the |corpus|-sized NN frame.
    *
    * Output: (vec_a, vec_b, sim) with vec_a < vec_b.
    */
  def mutualNearestPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         candidates: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cand = candidates.getOrElse(
      c.as("a").join(c.as("b"), col("a.id") =!= col("b.id"))
        .select(col("a.id").as("q_id"), col("b.id").as("id"),
          VectorFns.cosineR(col("a.vec"), col("b.vec")).as("sim")))
    val nn = cand.groupBy(col("q_id"))
      .agg(min(struct((-col("sim")).as("ns"), col("id"))).as("m"))
      .select(col("q_id"), col("m.id").as("nn_id"), (-col("m.ns")).as("sim"))
    nn.as("x").join(nn.as("y"),
        col("x.q_id") === col("y.nn_id") && col("y.q_id") === col("x.nn_id") &&
          col("x.q_id") < col("y.q_id"))
      .select(col("x.q_id").as("vec_a"), col("y.q_id").as("vec_b"),
        col("x.sim").as("sim"))
  }

  /** Diversity-aware top-k: maximal marginal relevance (Carbonell/
    * Goldstein MMR) over the top-`c` cosine candidates of each query —
    * the standard redundancy-suppression step for retrieval-augmented
    * pipelines (k near-identical hits are worth less than k distinct
    * ones). Greedy: pick the most-similar candidate, then repeatedly
    *
    *   argmax_d  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)
    *
    * ties on the id. Output: (q_id, mmr_rank, id, score) — `score` is
    * the selection-time objective (rank 1: the plain query cosine).
    *
    * Determinism/exactness: all cosines round to 6 decimals; the
    * objective is two IEEE products and one subtraction of those
    * exact values — bit-identical on any engine computing the same.
    *
    * Scale shape: the greedy loop is inherently sequential in k, but
    * each of the k−1 steps is DISTRIBUTED ACROSS QUERIES: bounded
    * joins/aggregations over the (|Q|·c) candidate and (|Q|·c²)
    * candidate-pair frames (both pinned once), never over the corpus
    * — a million queries MMR-select in the same k−1 rounds. Candidate
    * generation itself is [[bruteForceTopK]] here; swap in
    * [[ivfTopK]]'s cells for the ANN path, the selection composes
    * unchanged.
    */
  def mmrSelect(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, c: Int,
                lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && c >= k, s"mmrSelect needs 1 <= k <= c, got k=$k c=$c")
    val emb = corpus.select(col(idCol).as("id"), col(vecCol).as("_v"))
    val cands = graft.util.CacheScope.pin(
      bruteForceTopK(queries, corpus, idCol, vecCol, c)
        .select(col("q_id"), col("id"), col("sim").as("simq"))
        .join(emb, "id"))
    val pairs = graft.util.CacheScope.pin(
      cands.as("a").join(cands.as("b"),
          col("a.q_id") === col("b.q_id") && col("a.id") =!= col("b.id"))
        .select(col("a.q_id").as("q_id"), col("a.id").as("a_id"),
          col("b.id").as("b_id"),
          VectorFns.cosineR(col("a._v"), col("b._v")).as("sim_ab")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("id"))
    def pick(scored: DataFrame, rank: Int): DataFrame =
      scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("q_id"), lit(rank.toLong).as("mmr_rank"), col("id"), col("score"))
    var selected = pick(
      cands.select(col("q_id"), col("id"), col("simq").as("score")), 1)
    var all = selected
    for (step <- 2 to k) {
      val pen = pairs.join(
          all.select(col("q_id"), col("id").as("b_id")), Seq("q_id", "b_id"))
        .groupBy(col("q_id"), col("a_id")).agg(max(col("sim_ab")).as("_maxsim"))
      val scored = cands
        .join(all.select(col("q_id"), col("id")), Seq("q_id", "id"), "left_anti")
        .join(pen.withColumnRenamed("a_id", "id"), Seq("q_id", "id"))
        .select(col("q_id"), col("id"),
          (lit(lambda) * col("simq") - lit(1.0 - lambda) * col("_maxsim")).as("score"))
      selected = pick(scored, step)
      all = all.unionByName(selected)
    }
    all
  }
}
